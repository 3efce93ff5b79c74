"""The jitted training step: homography pair → frozen SuperPoint →
LightGlue (per-layer heads) → loss → grads → optimizer update.

One XLA program per step. Parallelism is declarative (parallel/mesh.py):
shard the image batch over ``data`` and the matcher params / optimizer
moments over ``model`` (megatron column/row rules) and the SAME step
runs dp×tp on any mesh — XLA inserts the gradient all-reduces from the
shardings, there is no pmap/psum code here. `jax.checkpoint` on every
transformer layer trades FLOPs for activation memory, which is what
lets max_keypoints-scale token counts train on one chip's HBM.
"""

import functools

import jax
import jax.numpy as jnp

try:
    import optax
except Exception:  # pragma: no cover
    optax = None

from ..models.extractors import superpoint as sp
from ..models.matchers import lightglue as lg
from ..models.layers import linear
from . import homography, losses


def _layer_apply(layer, x0, x1, enc0, enc1, mask0, mask1, num_heads):
    x0 = lg.self_block(layer["self_attn"], x0, enc0, mask0, num_heads)
    x1 = lg.self_block(layer["self_attn"], x1, enc1, mask1, num_heads)
    return lg.cross_block(layer["cross_attn"], x0, x1, mask0, mask1,
                          num_heads)


def forward_train(params, kpts0, kpts1, desc0, desc1, mask0, mask1,
                  size0, size1, num_heads=4, remat=True):
    """Single-pair training forward: returns the (L, N+1, M+1) stack of
    per-layer assignment log-scores and the (L−1, N)/(L−1, M) token
    confidences. fp32 throughout (training numerics)."""
    x0 = linear(params["input_proj"], desc0)
    x1 = linear(params["input_proj"], desc1)
    p0 = lg.normalize_keypoints(kpts0[:, :2], size0)
    p1 = lg.normalize_keypoints(kpts1[:, :2], size1)
    enc0 = lg.learnable_fourier_encoding(p0, params["posenc"]["Wr"]["w"])
    enc1 = lg.learnable_fourier_encoding(p1, params["posenc"]["Wr"]["w"])

    layer_fn = functools.partial(_layer_apply, num_heads=num_heads)
    if remat:
        layer_fn = jax.checkpoint(layer_fn)

    scores_all, confs0, confs1 = [], [], []
    n_layers = len(params["transformers"])
    for i, layer in enumerate(params["transformers"]):
        x0, x1 = layer_fn(layer, x0, x1, enc0, enc1, mask0, mask1)
        scores_all.append(lg.assignment(
            params["log_assignment"][i], x0, x1, mask0, mask1))
        if i < n_layers - 1:
            # confidence classifier trains on detached tokens (paper
            # §3.1: its gradient must not steer the backbone)
            tc = params["token_confidence"][i]["token"]
            confs0.append(jax.nn.sigmoid(
                linear(tc, jax.lax.stop_gradient(x0)))[:, 0])
            confs1.append(jax.nn.sigmoid(
                linear(tc, jax.lax.stop_gradient(x1)))[:, 0])
    return (jnp.stack(scores_all),
            jnp.stack(confs0) if confs0 else jnp.zeros((0,) + x0.shape[:1]),
            jnp.stack(confs1) if confs1 else jnp.zeros((0,) + x1.shape[:1]))


def make_optimizer(lr=1e-4, weight_decay=1e-5, clip=1.0):
    """AdamW behind a global-norm clip (the published schedule's core;
    plug a cosine/warmup schedule into ``lr`` for long runs)."""
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def pair_loss(lg_params, kpts0, kpts1, desc0, desc1, mask0, mask1,
              size_wh, H, num_heads=4, px_pos=3.0, px_neg=5.0,
              conf_weight=0.1, remat=True):
    """Deep-supervised assignment NLL + token-confidence BCE for one
    labelled pair."""
    scores, confs0, confs1 = forward_train(
        lg_params, kpts0, kpts1, desc0, desc1, mask0, mask1,
        size_wh, size_wh, num_heads=num_heads, remat=remat)
    gt0, pos0, neg0, neg1 = losses.gt_correspondences(
        kpts0, kpts1, mask0, mask1, H, size_wh,
        px_pos=px_pos, px_neg=px_neg)
    main = losses.deep_supervised_loss(scores, gt0, pos0, neg0, neg1)
    conf = losses.confidence_bce(confs0, confs1,
                                 jax.lax.stop_gradient(scores),
                                 mask0, mask1)
    n_pos = pos0.sum()
    return main + conf_weight * conf, {"nll": main, "conf_bce": conf,
                                       "n_pos": n_pos}


def train_step(lg_params, opt_state, sp_params, images, key, *,
               optimizer, max_keypoints=256, num_heads=4,
               keypoint_threshold=0.0, nms_radius=4, px_pos=3.0,
               px_neg=5.0, conf_weight=0.1, remat=True,
               homography_kwargs=None):
    """One optimisation step on a batch of base images (B, 1, H, W).

    Warps each image by a fresh random homography, extracts frozen
    SuperPoint features on both views, labels correspondences from the
    known warp and updates the LightGlue params. Returns
    (new_params, new_opt_state, metrics). jit with
    static_argnames=('optimizer', 'max_keypoints', ...) — or through
    ``make_train_step`` which closes over the statics.
    """
    b, _, h, w = images.shape
    k_h, _ = jax.random.split(key)
    Hs = homography.sample_warps(
        k_h, b, w, h, **(homography_kwargs or {}))
    warped = homography.warp_images(images, Hs)

    both = jnp.concatenate([images, warped], 0)
    valid = jnp.tile(jnp.asarray([[w, h]], jnp.int32), (2 * b, 1))
    feats = sp.apply(sp_params, both, valid, nms_radius=nms_radius,
                     max_keypoints=max_keypoints,
                     keypoint_threshold=keypoint_threshold,
                     precision="fp32")
    feats = jax.lax.stop_gradient(feats)  # frozen detector (published)
    size_wh = jnp.asarray([w, h], jnp.float32)

    def loss_fn(p):
        def per_pair(k0, k1, d0, d1, m0, m1, Hm):
            return pair_loss(p, k0, k1, d0, d1, m0, m1, size_wh, Hm,
                             num_heads=num_heads, px_pos=px_pos,
                             px_neg=px_neg, conf_weight=conf_weight,
                             remat=remat)

        loss, aux = jax.vmap(per_pair)(
            feats["keypoints"][:b], feats["keypoints"][b:],
            feats["descriptors"][:b].transpose(0, 2, 1),
            feats["descriptors"][b:].transpose(0, 2, 1),
            feats["mask"][:b], feats["mask"][b:], Hs)
        return loss.mean(), jax.tree_util.tree_map(jnp.mean, aux)

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        lg_params)
    updates, opt_state = optimizer.update(grads, opt_state, lg_params)
    lg_params = optax.apply_updates(lg_params, updates)
    metrics = {"loss": loss, **aux,
               "grad_norm": optax.global_norm(grads)}
    return lg_params, opt_state, metrics


def make_train_step(optimizer, **static_kwargs):
    """jit-compiled train_step with the statics closed over."""
    fn = functools.partial(train_step, optimizer=optimizer,
                           **static_kwargs)
    return jax.jit(fn)


def init_train_state(rng=None, n_layers=9, max_keypoints=256, lr=1e-4,
                     sp_checkpoint_npz=None):
    """(lg_params, opt_state, sp_params, optimizer) ready for
    train_step; sp defaults to the pretrained checkpoint when one is
    reachable, random init otherwise (utils/weights.py fallback).
    ``sp_checkpoint_npz`` plugs in a locally trained teacher (e.g. the
    homographic-adaptation output, train/drivers.py) — the natural
    pipeline where no upstream checkpoint can be downloaded."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    sp_conf = ({"checkpoint_npz": str(sp_checkpoint_npz)}
               if sp_checkpoint_npz else {})
    sp_params, _ = sp.load_params(sp_conf)
    lg_conf = {"features": "superpoint", "descriptor_dim": 256,
               "num_heads": 4, "n_layers": n_layers,
               "add_scale_ori": False}
    lg_params = lg.init_params(k2, lg_conf)
    del k1
    optimizer = make_optimizer(lr)
    opt_state = optimizer.init(lg_params)
    return lg_params, opt_state, sp_params, optimizer
