"""LoFTR homography training: the dense-tier analog of the LightGlue
homography pre-training stage (beyond-reference — the reference webui is
inference-only, imcui/hloc/utils/base_model.py:37-43).

Supervision comes from known planar warps, exactly as in the sparse
recipe (train/step.py): a random homography H maps image-0 pixels into
image 1, which labels the coarse dual-softmax grid densely and gives
subpixel targets for the fine spatial-expectation head (Sun et al.,
CVPR 2021 §3.4 — coarse log-likelihood + fine l2; we use the published
NLL rather than its focal reweighting since homography supervision has
no scale-imbalance problem at 1/8-grid densities).

TPU-first notes:
- the coarse loss is computed in the same **log-sum-exp form** the
  serving path uses (models/matchers/loftr.py coarse_match):
  ``log conf[i, j] = 2·sim − lse_row − lse_col`` — the NLL at GT cells
  needs only two logsumexp reductions over ``sim``, never a softmax
  matrix;
- fine supervision keeps static shapes by drawing a fixed-size random
  subset of positive cells per step (top-k over a uniform priority);
- the whole step (homography sampling, inverse warp, both towers,
  both losses, grads, adamw) is ONE jitted program; transformer layers
  are rematerialised so 1/8-grid token counts train on one chip's HBM.
"""

import functools

import jax
import jax.numpy as jnp

try:
    import optax
except Exception:  # pragma: no cover
    optax = None

from ..models.matchers import loftr as lf
from . import homography

CELL = 8           # coarse stride
FINE_STRIDE = 2    # fine-feature stride
FINE_R = lf.FINE_WINDOW // 2


def coarse_gt(H, hc, wc):
    """Dense coarse labels for one pair under homography H.

    Every coarse cell center of image 0 (full-res xy = (j·8+4, i·8+4))
    is warped into image 1; its GT partner is the cell containing the
    warped point. Returns (j_gt (L,) int32, pos (L,) bool, proj (L, 2)
    full-res xy in image 1). A cell is positive iff its warped center
    stays inside the image with a half-cell margin (so the fine window
    around the partner cell is fully in-bounds).
    """
    ii = jnp.arange(hc * wc) // wc
    jj = jnp.arange(hc * wc) % wc
    centers = jnp.stack([jj * CELL + CELL // 2, ii * CELL + CELL // 2],
                        -1).astype(jnp.float32)
    proj = homography.warp_points(H, centers)
    w_img, h_img = wc * CELL, hc * CELL
    m = CELL // 2
    pos = ((proj[:, 0] >= m) & (proj[:, 0] <= w_img - m)
           & (proj[:, 1] >= m) & (proj[:, 1] <= h_img - m))
    cx = jnp.clip((proj[:, 0] // CELL).astype(jnp.int32), 0, wc - 1)
    cy = jnp.clip((proj[:, 1] // CELL).astype(jnp.int32), 0, hc - 1)
    return cy * wc + cx, pos, proj


def forward_train(params, img0, img1, H, key, n_fine=128,
                  temperature=0.1, remat=True):
    """Single-pair training forward → (coarse NLL, fine l2, metrics).

    img*: (H, W, 1) f32. The towers mirror the serving forward
    (models/matchers/loftr.py forward_pair) with full-validity masks —
    training images are unpadded by construction.
    """
    featc, featf = lf.backbone_apply(params["backbone"],
                                     jnp.stack([img0, img1], 0))
    hc, wc = featc.shape[1:3]
    ll = hc * wc

    pe = lf.position_encoding(hc, wc).astype(featc.dtype)
    fc0 = (featc[0] + pe).reshape(-1, lf.D_COARSE)
    fc1 = (featc[1] + pe).reshape(-1, lf.D_COARSE)

    layer_fn = jax.checkpoint(lf.encoder_layer) if remat \
        else lf.encoder_layer
    for i, layer in enumerate(params["loftr_coarse"]["layers"]):
        if i % 2 == 0:
            fc0 = layer_fn(layer, fc0, fc0)
            fc1 = layer_fn(layer, fc1, fc1)
        else:
            fc0n = layer_fn(layer, fc0, fc1)
            fc1 = layer_fn(layer, fc1, fc0)
            fc0 = fc0n

    # coarse dual-softmax NLL at GT cells, in the serving LSE form
    d = fc0.shape[-1]
    sim = jnp.einsum("ld,sd->ls", fc0 / d**0.5, fc1 / d**0.5,
                     preferred_element_type=jnp.float32) / temperature
    lse_r = jax.nn.logsumexp(sim, 1)
    lse_c = jax.nn.logsumexp(sim, 0)
    j_gt, pos, proj = coarse_gt(H, hc, wc)
    sim_gt = jnp.take_along_axis(sim, j_gt[:, None], 1)[:, 0]
    logconf = 2.0 * sim_gt - lse_r - jnp.take(lse_c, j_gt)
    posf = pos.astype(jnp.float32)
    n_pos = jnp.maximum(posf.sum(), 1.0)
    loss_c = -(logconf * posf).sum() / n_pos

    # fine head on a fixed-size random subset of positives
    prio = jnp.where(pos, jax.random.uniform(key, (ll,)), -1.0)
    _, i_sel = jax.lax.top_k(prio, min(n_fine, ll))
    sel_ok = jnp.take(pos, i_sel)
    j_sel = jnp.take(j_gt, i_sel)

    down = params["fine_preprocess"]["down_proj"]
    merge = params["fine_preprocess"]["merge_feat"]
    win0 = lf.gather_fine_windows(featf[0], i_sel, wc)
    win1 = lf.gather_fine_windows(featf[1], j_sel, wc)
    c0 = lf.linear(down, jnp.take(fc0, i_sel, axis=0))
    c1 = lf.linear(down, jnp.take(fc1, j_sel, axis=0))
    win0 = lf.linear(merge, jnp.concatenate(
        [win0, jnp.broadcast_to(c0[:, None], win0.shape)], -1))
    win1 = lf.linear(merge, jnp.concatenate(
        [win1, jnp.broadcast_to(c1[:, None], win1.shape)], -1))
    offsets = lf.fine_match(params, win0, win1, sel_ok)  # fine px

    cj = (j_sel % wc).astype(jnp.float32) * CELL + CELL // 2
    ci = (j_sel // wc).astype(jnp.float32) * CELL + CELL // 2
    gt_off = (jnp.take(proj, i_sel, axis=0)
              - jnp.stack([cj, ci], -1)) / FINE_STRIDE
    # only supervise offsets the 5×5 window can express
    in_win = (jnp.abs(gt_off) <= FINE_R).all(-1) & sel_ok
    inf = in_win.astype(jnp.float32)
    n_fine_ok = jnp.maximum(inf.sum(), 1.0)
    loss_f = (((offsets - gt_off) ** 2).sum(-1) * inf).sum() / n_fine_ok

    metrics = {
        "loss_coarse": loss_c,
        "loss_fine": loss_f,
        "n_pos": n_pos,
        # training-signal proxy: how often the row-argmax already hits
        # the GT cell (coarse precision before thresholding)
        "coarse_acc": ((jnp.argmax(sim, 1) == j_gt) * posf).sum() / n_pos,
        "fine_px": (jnp.sqrt(((offsets - gt_off) ** 2).sum(-1))
                    * inf).sum() / n_fine_ok * FINE_STRIDE,
    }
    return loss_c, loss_f, metrics


def make_train_step(optimizer, h, w, batch, n_fine=128, w_fine=0.25,
                    remat=True):
    """One jitted program: sample warps → warp batch → vmapped pair
    forwards → mean loss → grads → update."""

    def loss_fn(params, images, key):
        kh, kw = jax.random.split(key)
        Hs = homography.sample_homographies(kh, batch, w, h)
        warped = homography.warp_images(images, Hs)  # (B,1,H,W)
        img0 = images.transpose(0, 2, 3, 1)
        img1 = warped.transpose(0, 2, 3, 1)
        keys = jax.random.split(kw, batch)
        lc, lff, m = jax.vmap(
            lambda a, b, Hm, k: forward_train(
                params, a, b, Hm, k, n_fine=n_fine, remat=remat)
        )(img0, img1, Hs, keys)
        loss = lc.mean() + w_fine * lff.mean()
        return loss, {k: v.mean() for k, v in m.items()}

    @jax.jit
    def step(params, opt_state, images, key):
        (loss, m), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, images, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        m["loss"] = loss
        return params, opt_state, m

    return step


def eval_precision(params, images, key, size_px=3.0,
                   match_threshold=0.2):
    """Serving-path eval on fresh warps of held-out images: fraction of
    emitted matches within ``size_px`` of the GT transfer, plus match
    count (the dense analog of drivers.eval_recall)."""
    b, _, h, w = images.shape
    Hs = homography.sample_homographies(key, b, w, h)
    warped = homography.warp_images(images, Hs)
    conf = {"match_threshold": match_threshold, "temperature": 0.1,
            "max_matches": 512}
    wh = jnp.asarray([w, h], jnp.int32)

    @jax.jit
    def run(params, i0, i1, Hm):
        out = jax.vmap(
            lambda a, b_: lf.forward_pair(params, a, b_, wh, wh, conf)
        )(i0, i1)
        proj = jax.vmap(homography.warp_points)(Hm, out["keypoints0"])
        err = jnp.linalg.norm(proj - out["keypoints1"], axis=-1)
        ok = out["mask"]
        hit = ((err < size_px) & ok).sum()
        return hit, ok.sum()

    hit, tot = run(params, images.transpose(0, 2, 3, 1),
                   warped.transpose(0, 2, 3, 1), Hs)
    return float(hit) / max(float(tot), 1.0), float(tot) / b
