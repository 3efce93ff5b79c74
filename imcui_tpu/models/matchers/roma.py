"""RoMa — robust dense feature matching (DINOv2 + GP coarse matcher +
multi-scale conv refiners), native JAX.

Reference contract: imcui/hloc/matchers/roma.py:17-94 — ``match()``
produces a dense warp + certainty field at ``coarse_res`` (560²),
``sample()`` draws ``max_keypoints`` correspondences, and
``to_pixel_coordinates`` maps the normalised warp to pixels. The wrapper
flattens that into the standalone dense-matcher output
{keypoints0, keypoints1, mconf}.

Architecture (published RoMa design, CVPR'24; upstream lives in the
empty third_party/RoMa submodule):
- **Coarse encoder**: frozen DINOv2 ViT-L/14 (backbones/dinov2.py),
  560² → 40² patch tokens, projected 1024→512.
- **Fine encoder**: VGG19 pyramid at strides 8/4/2/1 (backbones/vgg.py).
- **GP coarse matcher**: exponential-cosine kernel Gaussian-process
  posterior mean regressing a Fourier embedding of image1's coordinate
  grid onto image0's tokens (the DKM/RoMa "GP module").
- **Match decoder**: 5 ViT blocks over [projected f0 ‖ GP output]
  tokens, classifying over a 64×64 anchor grid (regression-by-
  classification) + a certainty channel.
- **Conv refiners**: per-scale depthwise-separable conv stacks with
  displacement embedding and local-correlation inputs (radius 7/3/2 at
  strides 16/8/4), refining warp+certainty coarse→fine.

TPU notes: everything is dense fixed-shape einsum/conv work — the GP
solve is a single (1600×1600) Cholesky per pair, attention is plain MXU
einsums, and the (2r+1)² local correlations vectorise as a vmap over
offsets of the bilinear gather. The whole ``match`` jits as one program
and vmaps over the pair batch.

Hyperparameters not recoverable from the paper alone (hidden-block
counts, displacement-embedding dims) follow the published DKM/RoMa
configuration table; the conversion path is rank-based and validates
tree congruence, so a first contact with the real checkpoint will
loudly flag — not silently mis-load — any divergence. The previous
round's lightweight "fpn-corr" correlation matcher remains as the
explicit fallback backbone (conf["backbone"]="fpn-corr") and is still
used by the RoMaV2 recurrent variant.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import sampling
from ...utils.base_model import BaseModel
from ...utils.weights import (download_checkpoint, load_params_auto,
                              load_state_dict)
from ..backbones import dinov2, vgg
from ..backbones import vit as vit_mod
from ..layers import (apply_precision, batch_norm_inference, conv2d,
                      depthwise_conv, fold2x2, fold2x2_bn, fold2x2_conv1x1,
                      fold2x2_conv5x5, init_conv, init_layer_norm,
                      init_linear, layer_norm, linear, relu, unfold2x2,
                      vmap_pairs)
from . import loftr as loftr_mod

# ---------------------------------------------------------------------------
# configuration (published RoMa/DKM table)
# ---------------------------------------------------------------------------

# per-scale refiner config: projected feat dim, displacement-embedding
# dim, local-corr radius, hidden width, hidden depth, depthwise?
# (upstream roma_models.py conv_refiner dict; hidden = in_dim for every
# scale, e.g. "2": ConvRefiner(2·64+16, 128+16, …))
REFINERS = {
    "16": dict(feat=512, disp=128, r=7, blocks=8, dw=True),
    "8": dict(feat=512, disp=64, r=3, blocks=8, dw=True),
    "4": dict(feat=256, disp=32, r=2, blocks=8, dw=True),
    "2": dict(feat=64, disp=16, r=0, blocks=8, dw=True),
    "1": dict(feat=9, disp=6, r=0, blocks=5, dw=False),
}
# per-scale 1×1 projection (cin, cout) from the encoder features
PROJ = {"16": (1024, 512), "8": (512, 512), "4": (256, 256),
        "2": (128, 64), "1": (64, 9)}

GP_DIM = 512
KERNEL_T = 0.2          # upstream kernel_temperature
GP_SIGMA_NOISE = 0.1    # upstream GP sigma_noise
DECODER_DEPTH = 5
DECODER_HEADS = 8
ANCHOR_RES = 64
DISP_EMB_SCALE = 40.0 / 32.0  # upstream ConvRefiner disp_emb input scale


def _refiner_in_dim(cfg):
    return 2 * cfg["feat"] + cfg["disp"] + (2 * cfg["r"] + 1) ** 2 * (
        1 if cfg["r"] else 0)


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

def init_bn(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,)),
            "mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))}


def _init_refiner_block(key, cin, cout, dw):
    """Upstream ConvRefiner.create_block: Sequential(5×5 grouped conv,
    BatchNorm, ReLU, 1×1 conv) — torch indices 0/1/(2)/3. Depthwise means
    groups = cin on the 5×5 (kernel cin/groups = 1)."""
    k1, k2 = jax.random.split(key)
    return {"0": init_conv(k1, 5, 5, 1 if dw else cin, cout),
            "1": init_bn(cout),
            "3": init_conv(k2, 1, 1, cout, cout)}


def init_refiner(key, cfg):
    in_dim = _refiner_in_dim(cfg)
    hidden = in_dim
    keys = jax.random.split(key, cfg["blocks"] + 3)
    p = {
        "disp_emb": init_conv(keys[0], 1, 1, 2, cfg["disp"]),
        "block1": _init_refiner_block(keys[1], in_dim, hidden, cfg["dw"]),
        "hidden_blocks": [
            _init_refiner_block(keys[3 + i], hidden, hidden, cfg["dw"])
            for i in range(cfg["blocks"])
        ],
        "out_conv": init_conv(keys[2], 1, 1, hidden, 3),
    }
    return p


def init_params(rng, conf=None):
    conf = conf or {}
    variant = conf.get("dinov2_variant", "vitl14")
    gp_dim = conf.get("gp_dim", GP_DIM)
    feat16 = PROJ["16"][1]
    dec_dim = feat16 + gp_dim
    keys = iter(jax.random.split(rng, 32))
    params = {
        "dinov2": dinov2.init_params(next(keys), variant),
        "encoder_cnn": vgg.init_params(next(keys)),
        "proj": {
            s: {"0": init_conv(next(keys), 1, 1, cin, cout),
                "1": init_bn(cout)}
            for s, (cin, cout) in PROJ.items()
        },
        # upstream GP module: gps.16.pos_conv — a 1×1 conv embedding the
        # coordinate grid; basis "fourier" = cos(8π · pos_conv(coords))
        "gps": {"16": {"pos_conv": init_conv(next(keys), 1, 1, 2,
                                             gp_dim)}},
        "embedding_decoder": {
            "blocks": [vit_mod.init_encoder_block(next(keys), dec_dim)
                       for _ in range(conf.get("decoder_depth",
                                               DECODER_DEPTH))],
            "to_out": init_linear(next(keys), dec_dim,
                                  ANCHOR_RES ** 2 + 1),
        },
        "conv_refiner": {s: init_refiner(next(keys), cfg)
                         for s, cfg in REFINERS.items()},
    }
    if variant != "vitl14":  # small-variant projection for tests
        d = dinov2.CONFIGS[variant]["dim"]
        params["proj"]["16"] = {
            "0": init_conv(jax.random.fold_in(rng, 99), 1, 1, d, feat16),
            "1": init_bn(feat16)}
    return params


# ---------------------------------------------------------------------------
# GP coarse matcher
# ---------------------------------------------------------------------------

def coord_grid(h, w):
    """(h·w, 2) normalised (x, y) cell-center coordinates in [-1, 1]."""
    gy, gx = jnp.meshgrid(
        (jnp.arange(h) + 0.5) / h * 2 - 1,
        (jnp.arange(w) + 0.5) / w * 2 - 1,
        indexing="ij",
    )
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)


def fourier_embed(coords, pos_conv):
    """Upstream GP "fourier" basis: cos(8π · pos_conv(coords)).
    coords (N, 2); pos_conv a 1×1 conv {w (1,1,2,D), b (D,)} → (N, D)."""
    proj = coords @ pos_conv["w"][0, 0] + pos_conv["b"]
    return jnp.cos(8.0 * jnp.pi * proj)


def cos_kernel(x, y, temperature=KERNEL_T, eps=1e-6):
    """Upstream CosKernel: exp((cosine_sim − 1) / T)."""
    num = jnp.einsum("nd,md->nm", x, y,
                     preferred_element_type=jnp.float32)
    den = (jnp.linalg.norm(x, axis=-1)[:, None]
           * jnp.linalg.norm(y, axis=-1)[None, :] + eps)
    return jnp.exp((num / den - 1.0) / temperature)


def gp_posterior(f0, f1, emb1, temperature=KERNEL_T,
                 sigma_noise=GP_SIGMA_NOISE):
    """Cosine-kernel GP posterior mean (upstream GP, no_cov=True).

    f0: (N0, D) query tokens, f1: (N1, D) support tokens, emb1: (N1, E)
    regression targets (embedded coords of image1). Returns
    (N0, E) = K01 (K11 + σ_noise·I)⁻¹ emb1.
    """
    k01 = cos_kernel(f0, f1, temperature)
    k11 = cos_kernel(f1, f1, temperature)
    n1 = k11.shape[0]
    rhs = jax.scipy.linalg.solve(
        k11 + sigma_noise * jnp.eye(n1, dtype=k11.dtype), emb1,
        assume_a="pos")
    return k01 @ rhs


def cls_to_flow_refine(logits):
    """Upstream ``cls_to_flow_refine``: regression-by-classification with
    LOCAL expectation — softmax over the 64×64 anchor grid, take the mode
    and its 4 neighbours {±1, ±res}, renormalise, expected coordinate.
    (A global expectation is biased on multimodal distributions — the
    published inference path uses this mode-local version.)
    logits: (N, A²) → (N, 2) in [-1, 1]."""
    anchors = coord_grid(ANCHOR_RES, ANCHOR_RES)  # (A², 2)
    probs = jax.nn.softmax(logits, -1)
    mode = jnp.argmax(probs, -1)
    idx = jnp.stack([mode - 1, mode, mode + 1,
                     mode - ANCHOR_RES, mode + ANCHOR_RES], -1)
    idx = jnp.clip(idx, 0, ANCHOR_RES ** 2 - 1)          # (N, 5)
    w = jnp.take_along_axis(probs, idx, axis=-1)         # (N, 5)
    pts = anchors[idx]                                   # (N, 5, 2)
    return (w[..., None] * pts).sum(1) / jnp.maximum(
        w.sum(-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# refinement
# ---------------------------------------------------------------------------

def bilinear_warp(feat, warp):
    """Sample feat (Hc, Wc, D) at normalised warp coords (..., 2) —
    torch grid_sample semantics (align_corners=False, zeros padding),
    matching upstream ConvRefiner.forward's x_hat/local_correlation."""
    return sampling.grid_sample(feat, warp, mode="bilinear",
                                align_corners=False)


def local_correlation(f0, f1, warp, r):
    """(2r+1)² local correlation: f0[p] · f1[warp(p) + δ] for δ in the
    (2r+1)² neighbourhood (in f1-grid units).

    Two exact formulations (r3 measurement, tools/try_refiner_parts.py):
    - coarse grids (h·w ≤ 6400, scales 16/8): ONE all-pairs MXU matmul
      C = F0·F1ᵀ, then scalar bilinear interpolation of C — linearity of
      the dot product moves the interpolation outside the channel dim,
      so the (2r+2)² integer taps gather SCALARS instead of d-vectors
      (30.1 → 18.9 ms at scale 16, 22.4 → 13.3 at scale 8);
    - fine grids: per-offset bilinear feature gathers (the all-pairs
      matrix would be ≥1.5 GB at scale 4).
    """
    h, w, d = f0.shape
    if h * w <= 6400:
        return _local_correlation_mxu(f0, f1, warp, r)
    return _local_correlation_int_taps(f0, f1, warp, r)


def _warp_corners(warp, h, w):
    """torch unnormalize (align_corners=False) → integer corner + frac."""
    hw = h * w
    px = ((warp[..., 0].astype(jnp.float32) + 1.0) * w - 1.0) * 0.5
    py = ((warp[..., 1].astype(jnp.float32) + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    tx = (px - x0).reshape(hw)
    ty = (py - y0).reshape(hw)
    return (x0.astype(jnp.int32).reshape(hw),
            y0.astype(jnp.int32).reshape(hw), tx, ty)


def _interp_taps(taps, ty, tx, r):
    """Bilinear-combine scalar integer-tap correlations into the
    (2r+1)² offset outputs (row-major over (dy, dx), matching the
    gather path's offset ordering)."""
    outs = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            v = ((1 - ty) * ((1 - tx) * taps[(dy, dx)]
                             + tx * taps[(dy, dx + 1)])
                 + ty * ((1 - tx) * taps[(dy + 1, dx)]
                         + tx * taps[(dy + 1, dx + 1)]))
            outs.append(v)
    return outs


def _local_correlation_mxu(f0, f1, warp, r):
    """All-pairs-then-interpolate local correlation (exact rewrite of
    the gather path — grid_sample(align_corners=False, zeros) semantics
    reproduced on the scalar correlation surface)."""
    h, w, d = f0.shape
    hw = h * w
    corr_all = jax.lax.dot_general(
        f0.reshape(hw, d), f1.reshape(hw, d),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(d))                        # (hw_p, hw_q)

    x0, y0, tx, ty = _warp_corners(warp, h, w)

    # integer taps dy', dx' ∈ [-r, r+1] cover every bilinear corner of
    # every offset in [-r, r]
    taps = {}
    for dyp in range(-r, r + 2):
        for dxp in range(-r, r + 2):
            yy = y0 + dyp
            xx = x0 + dxp
            ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            q = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
            v = jnp.take_along_axis(corr_all, q[:, None], axis=1)[:, 0]
            taps[(dyp, dxp)] = jnp.where(ok, v, 0.0)

    outs = _interp_taps(taps, ty, tx, r)
    return jnp.stack(outs, -1).reshape(h, w, (2 * r + 1) ** 2)


def _local_correlation_int_taps(f0, f1, warp, r):
    """Fine-scale variant: gather FEATURE vectors at the (2r+2)²
    integer taps (no per-corner bilinear feature interpolation — the
    interpolation happens on the scalar correlations), cutting gather
    traffic ~2.8× vs the per-offset grid_sample formulation."""
    h, w, d = f0.shape
    hw = h * w
    f0f = f0.reshape(hw, d)
    f1f = f1.reshape(hw, d)
    x0, y0, tx, ty = _warp_corners(warp, h, w)

    taps = {}
    for dyp in range(-r, r + 2):
        for dxp in range(-r, r + 2):
            yy = y0 + dyp
            xx = x0 + dxp
            ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            q = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
            s = jnp.take(f1f, q, axis=0)                # (hw, d)
            v = (f0f.astype(jnp.float32)
                 * s.astype(jnp.float32)).sum(-1) / jnp.sqrt(
                     jnp.float32(d))
            taps[(dyp, dxp)] = jnp.where(ok, v, 0.0)

    outs = _interp_taps(taps, ty, tx, r)
    return jnp.stack(outs, -1).reshape(h, w, (2 * r + 1) ** 2)


def _local_correlation_gather(f0, f1, warp, r):
    """Reference formulation (kept for tests): per-offset bilinear
    feature samples via grid_sample."""
    h, w, d = f0.shape
    dy, dx = jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1),
                          indexing="ij")
    offs = jnp.stack([dx.reshape(-1) * 2.0 / w, dy.reshape(-1) * 2.0 / h],
                     -1)  # (K, 2) normalised

    def one(off):
        s = bilinear_warp(f1, warp + off)
        return (f0 * s).sum(-1) / jnp.sqrt(jnp.float32(d))

    corr = jax.vmap(one)(offs)          # (K, h, w)
    return corr.transpose(1, 2, 0)      # (h, w, K)


def _refiner_block(blk, x, dw):
    """Upstream create_block: 5×5 grouped conv → BN → ReLU → 1×1 conv.
    The depthwise 5×5 runs as shift-and-accumulate (layers.
    depthwise_conv): XLA's feature_group_count lowering serialises over
    the ~1400 groups and made the refiner pyramid ~100 of RoMa's 154
    ms/pair (r3 profile)."""
    y = depthwise_conv(blk["0"], x) if dw else conv2d(blk["0"], x)
    y = relu(batch_norm_inference(blk["1"], y))
    return conv2d(blk["3"], y)


def refiner_apply(p, cfg, f0, f1, warp, cert,
                  disp_scale=DISP_EMB_SCALE, fold=True):
    """One ConvRefiner step at this scale's grid. f0/f1: (h, w, feat);
    warp: (h, w, 2) normalised; cert: (h, w) logits.

    Upstream semantics: the displacement embedding consumes the RELATIVE
    displacement (flow − identity grid), scaled by 40/32 in RoMa (1.0 in
    DKM); the predicted delta is divided by the grid size to return to
    normalised units (constant flagged for first real-weight contact —
    any fixed factor is absorbed by the trained out_conv)."""
    h, w, _ = f0.shape
    warped = bilinear_warp(f1, warp)
    disp = warp - coord_grid(h, w).reshape(h, w, 2)
    ins = [f0, warped,
           conv2d(p["disp_emb"], (disp_scale * disp)[None])[0]]
    if cfg["r"]:
        ins.append(local_correlation(f0, f1, warp, cfg["r"]))
    x = jnp.concatenate(ins, -1)[None]
    if fold and not cfg["dw"] and h % 2 == 0 and w % 2 == 0:
        # 2×2-folded chain for the full-conv scale-1 refiner: 5×5 convs at
        # C≤24 over the full-res grid run at ≤19% lane occupancy; folding
        # 2×2 pixel blocks into channels turns them into 3×3 convs at 4C
        # over (h/2, w/2) — 1.44× the FLOPs at 4× the occupancy. Exact
        # (tests/test_fold2x2.py); weight folding happens at trace time.
        def foldb(blk):
            return {"0": fold2x2_conv5x5(blk["0"]),
                    "1": fold2x2_bn(blk["1"]),
                    "3": fold2x2_conv1x1(blk["3"])}

        x = fold2x2(x[0])[None]
        x = _refiner_block(foldb(p["block1"]), x, False)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[foldb(b) for b in p["hidden_blocks"]])

        def body(h, blk):
            return _refiner_block(blk, h, False), None

        x, _ = jax.lax.scan(body, x, stacked)
        out = unfold2x2(conv2d(fold2x2_conv1x1(p["out_conv"]), x)[0])
    else:
        x = _refiner_block(p["block1"], x, cfg["dw"])
        # hidden blocks share shapes → lax.scan keeps the HLO one-body-deep
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *p["hidden_blocks"])

        def body(h, blk):
            return _refiner_block(blk, h, cfg["dw"]), None

        x, _ = jax.lax.scan(body, x, stacked)
        out = conv2d(p["out_conv"], x)[0]
    # upstream Decoder.forward: flow += ins·Δ/(4·W_full) = Δ/(4·w_grid)
    dwarp = out[..., :2] * jnp.asarray([0.25 / w, 0.25 / h])
    return warp + dwarp, cert + out[..., 2]


def _resize(x, h, w):
    return jax.image.resize(x, (h, w) + x.shape[2:], "bilinear")


# ---------------------------------------------------------------------------
# full match
# ---------------------------------------------------------------------------

def match_gp(params, image0, image1, conf):
    """Dense warp + certainty on the coarse_res grid.

    image0/1: (H, W, 3) RGB in [0,1] at coarse_res (H, W divisible by 14
    and 8). Returns warp (H, W, 2) normalised coords into image1 and
    certainty (H, W) in [0, 1].
    """
    variant = conf.get("dinov2_variant", "vitl14")
    d0, (hp, wp) = dinov2.apply(params["dinov2"], image0, variant)
    d1, _ = dinov2.apply(params["dinov2"], image1, variant)
    v0 = vgg.apply(params["encoder_cnn"], image0)
    v1 = vgg.apply(params["encoder_cnn"], image1)

    def proj(s, feat):
        p = params["proj"][s]
        return batch_norm_inference(p["1"], conv2d(p["0"], feat[None]))[0]

    f0_16 = proj("16", d0.reshape(hp, wp, -1))
    f1_16 = proj("16", d1.reshape(hp, wp, -1))

    # GP coarse regression + transformer match decoder. Upstream token
    # layout: cat((gp_posterior, features)) — GP channels FIRST
    # (roma TransformerDecoder.forward), then 5 pre-norm ViT blocks and a
    # plain to_out Linear (no final norm).
    emb1 = fourier_embed(coord_grid(hp, wp),
                         params["gps"]["16"]["pos_conv"])
    gp_out = gp_posterior(f0_16.reshape(hp * wp, -1),
                          f1_16.reshape(hp * wp, -1), emb1)
    tokens = jnp.concatenate([gp_out, f0_16.reshape(hp * wp, -1)], -1)
    dec = params["embedding_decoder"]
    dec_stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *dec["blocks"])
    tokens, _ = jax.lax.scan(
        lambda t, blk: (vit_mod.encoder_block_apply(blk, t,
                                                    DECODER_HEADS), None),
        tokens, dec_stacked)
    out = linear(dec["to_out"], tokens)
    warp = cls_to_flow_refine(out[:, :-1]).reshape(hp, wp, 2)
    cert = out[:, -1].reshape(hp, wp)

    # coarse-scale refiner on the DINOv2-projected features
    warp, cert = refiner_apply(params["conv_refiner"]["16"],
                               REFINERS["16"], f0_16, f1_16, warp, cert)

    # fine refiners on the VGG pyramid, coarse → fine
    for s in (8, 4, 2, 1):
        fs0 = proj(str(s), v0[s])
        fs1 = proj(str(s), v1[s])
        hs, ws, _ = fs0.shape
        warp = _resize(warp, hs, ws)
        cert = _resize(cert[..., None], hs, ws)[..., 0]
        warp, cert = refiner_apply(params["conv_refiner"][str(s)],
                                   REFINERS[str(s)], fs0, fs1, warp, cert)

    return warp, jax.nn.sigmoid(cert)


# ---------------------------------------------------------------------------
# legacy lightweight path (fpn-corr fallback; used by RoMaV2's recurrent
# refinement and as the no-checkpoint CI backbone)
# ---------------------------------------------------------------------------

def init_params_fpn(rng):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "backbone": loftr_mod.init_backbone(k1),
        "refiner": {
            # input: [feat0 (256), warped feat1 (256), warp (2), cert (1)]
            "conv1": init_conv(k2, 3, 3, 515, 256),
            "conv2": init_conv(k3, 3, 3, 256, 128),
            "out": init_conv(k4, 3, 3, 128, 3),  # dwarp (2) + dcert (1)
        },
    }


def correlation_warp(f0, f1, temperature=0.05):
    """Coarse warp by soft-argmax over the correlation volume.

    f0/f1: (Hc, Wc, D) → warp (Hc, Wc, 2) in normalised [-1, 1] coords of
    image1, certainty (Hc, Wc)."""
    hc, wc, d = f0.shape
    a = f0.reshape(-1, d)
    b = f1.reshape(-1, d)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-8)
    sim = jnp.einsum("nd,md->nm", a, b,
                     preferred_element_type=jnp.float32) / temperature
    attn = jax.nn.softmax(sim, -1)  # (N0, N1)
    warp = attn @ coord_grid(hc, wc)  # expected target coords
    certainty = jnp.max(attn, -1)  # peakiness as confidence
    return warp.reshape(hc, wc, 2), certainty.reshape(hc, wc)


def refine(params, f0, f1, warp, cert):
    """One conv refinement step on [f0, warp(f1), warp, cert]."""
    warped = bilinear_warp(f1, warp)
    inp = jnp.concatenate(
        [f0, warped, warp, cert[..., None]], -1
    )[None]
    x = relu(conv2d(params["conv1"], inp))
    x = relu(conv2d(params["conv2"], x))
    out = conv2d(params["out"], x)[0]
    return warp + 0.1 * jnp.tanh(out[..., :2]), \
        jax.nn.sigmoid(out[..., 2]) * cert


def match(params, image0, image1, conf=None):
    """Dense warp + certainty (the reference's roma.match analog).

    Dispatches on the param tree: the full DINOv2+GP architecture when
    present (RGB (H, W, 3) inputs), else the fpn-corr fallback
    (grayscale (H, W, 1))."""
    if "dinov2" in params:
        return match_gp(params, image0, image1, conf or {})
    featc, _ = loftr_mod.backbone_apply(
        params["backbone"], jnp.stack([image0, image1], 0))
    f0, f1 = featc[0], featc[1]
    warp, cert = correlation_warp(f0, f1)
    warp, cert = refine(params["refiner"], f0, f1, warp, cert)
    return warp, cert


def load_params(conf):
    """Pretrained load: roma_outdoor.pth (decoder/refiners/VGG) +
    dinov2_vitl14_pretrain.pth (frozen encoder), mirroring the reference
    wrapper's two-file load (imcui/hloc/matchers/roma.py:33-56).
    Offline or fpn-corr conf → deterministic random init."""
    if conf.get("backbone") == "fpn-corr":
        return init_params_fpn(jax.random.PRNGKey(0)), {
            "pretrained": False, "backbone": "fpn-corr"}
    init = init_params(jax.random.PRNGKey(0), conf)
    main_init = {k: v for k, v in init.items() if k != "dinov2"}
    params, meta = load_params_auto(
        conf.get("model_name", "roma_outdoor.pth"), main_init, "roma",
        rename=((r"^encoder\.cnn\.", "encoder_cnn."),
                (r"^decoder\.", "")),
        drop=(r"^encoder\.dinov2", r"amp", r"sample_mode"),
    )
    params = dict(params)
    dpath = download_checkpoint(
        conf.get("model_utils_name", "dinov2_vitl14_pretrain.pth"))
    if dpath is not None:
        depth = dinov2.CONFIGS[conf.get("dinov2_variant", "vitl14")]["depth"]
        params["dinov2"] = dinov2.convert_state_dict(
            load_state_dict(dpath), depth)
        meta["dinov2_pretrained"] = True
    else:
        params["dinov2"] = init["dinov2"]
        meta["dinov2_pretrained"] = False
        meta["pretrained"] = False
    meta["backbone"] = "dinov2-gp"
    return params, meta


# ---------------------------------------------------------------------------
# sampling / wrapper (reference roma.py I/O contract)
# ---------------------------------------------------------------------------

def to_pixel_coordinates(warp_coords, h, w):
    """Normalised [-1, 1] → pixel coords (reference parity:
    matchers/roma.py:82-87)."""
    return jnp.stack(
        [(warp_coords[..., 0] + 1) * 0.5 * (w - 1),
         (warp_coords[..., 1] + 1) * 0.5 * (h - 1)], -1,
    )


def sample(warp, cert, h, w, num=2048, threshold=0.0, recall_target=0.95):
    """Draw the top-``num`` correspondences by certainty (the reference's
    roma.sample analog, deterministic top-k instead of multinomial —
    upstream draws multinomially from the certainty mass, so exact rank
    order is not part of the contract). ``approx_max_k`` instead of the
    exact sort: the exact ``lax.top_k`` over the 560² = 313k certainty
    grid cost ~3 ms/pair measured at the bench level (101.1 → 97.9
    ms/pair, r4; the rest of that round's gap was the vmap(B=1)
    wrapper — see layers.vmap_pairs). ``recall_target`` is exposed via
    conf["sample_recall_target"] (advisor r4); pass 1.0 for the exact
    top-k when which correspondences reach RANSAC must be bit-stable."""
    hc, wc = cert.shape
    src = coord_grid(hc, wc)  # normalised source coords
    k0 = to_pixel_coordinates(src, h, w)
    k1 = to_pixel_coordinates(warp.reshape(-1, 2), h, w)
    flat_cert = cert.reshape(-1)
    if num >= flat_cert.shape[0]:
        top, idx = jax.lax.top_k(flat_cert, flat_cert.shape[0])
    elif recall_target >= 1.0:
        top, idx = jax.lax.top_k(flat_cert, num)
    else:
        top, idx = jax.lax.approx_max_k(flat_cert, num,
                                        recall_target=recall_target)
    valid = top > threshold
    return (jnp.where(valid[:, None], k0[idx], 0.0),
            jnp.where(valid[:, None], k1[idx], 0.0),
            jnp.where(valid, top, 0.0), valid)


@functools.partial(jax.jit, static_argnames=("max_matches", "conf_key"))
def _apply_batched(params, image0, image1, max_matches, conf_key=()):
    conf = dict(conf_key)

    def per_pair(a, b):
        warp, cert = match(params, a, b, conf)
        h, w = a.shape[0], a.shape[1]
        k0, k1, score, valid = sample(
            warp, cert, h, w, num=max_matches,
            recall_target=conf.get("sample_recall_target", 0.95))
        return {"keypoints0": k0, "keypoints1": k1, "scores": score,
                "mask": valid}

    return vmap_pairs(per_pair)(image0, image1)


class Roma(BaseModel):
    """Reference contract: imcui/hloc/matchers/roma.py:17-94 — standalone
    dense warp matcher."""

    default_conf = {
        "model_name": "roma_outdoor.pth",
        "model_utils_name": "dinov2_vitl14_pretrain.pth",
        "max_keypoints": 2048,
        "backbone": "dinov2-gp",   # or "fpn-corr" (lightweight fallback)
        "coarse_res": (560, 560),
        "upsample_res": (864, 1152),
        "dinov2_variant": "vitl14",
        # serving precision: None/"f32", "bf16", or "int8" (W8A8 dynamic
        # quantisation of the wide DINOv2/decoder projections —
        # layers.apply_precision)
        "precision": None,
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        self.params = apply_precision(
            self.params, conf.get("precision"),
            conv_min_ch=conf.get("int8_conv_min_ch"))
        self._conf_key = tuple(sorted({
            "dinov2_variant": conf.get("dinov2_variant", "vitl14"),
            "sample_recall_target": conf.get("sample_recall_target", 0.95),
        }.items()))

    def _forward(self, data):
        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)
        gp = "dinov2" in self.params

        def prep(img):
            x = img.transpose(0, 2, 3, 1)
            if gp:
                if x.shape[-1] == 1:
                    x = jnp.tile(x, (1, 1, 1, 3))
                ch, cw = self.conf["coarse_res"]
                x = jax.image.resize(
                    x, (x.shape[0], ch, cw, 3), "bilinear")
            elif x.shape[-1] == 3:
                x = x.mean(-1, keepdims=True)
            if self.conf.get("precision") in ("bf16", "int8"):
                x = x.astype(jnp.bfloat16)
            return x

        out = _apply_batched(self.params, prep(image0), prep(image1),
                             int(self.conf["max_keypoints"]),
                             conf_key=self._conf_key if gp else ())
        # matches are in coarse_res pixels when the GP path resized;
        # rescale to the model-input resolution
        if gp:
            h0, w0 = image0.shape[-2:]
            h1, w1 = image1.shape[-2:]
            ch, cw = self.conf["coarse_res"]
            s0 = jnp.asarray([(w0 - 1) / (cw - 1), (h0 - 1) / (ch - 1)])
            s1 = jnp.asarray([(w1 - 1) / (cw - 1), (h1 - 1) / (ch - 1)])
            out = dict(out)
            out["keypoints0"] = out["keypoints0"] * s0
            out["keypoints1"] = out["keypoints1"] * s1
        out["mconf"] = out["scores"]
        return out
