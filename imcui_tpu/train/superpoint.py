"""SuperPoint detector+descriptor training (DeTone et al., CVPR-W 2018).

The published recipe, TPU-native: ground-truth corners come from the
on-device synthetic corpus (data.synthetic_images_with_corners — the
MagicPoint stage's corpus), each step warps the image by a fresh random
homography (train/homography.py) and optimises

- **detector loss** on BOTH views: per-8×8-cell softmax cross-entropy
  over 65 classes — the in-cell position (row-major 0..63) of a GT
  corner, or the dustbin class 64 for empty cells (paper eq. 2-3);
- **descriptor loss**: the dense hinge over all cell pairs
  (paper eq. 4): positives (cell centers within 8 px under the
  homography) pull dot-products above m_pos = 1, negatives push below
  m_neg = 0.2, positive terms weighted λ_d.

Everything — corpus, warp, labels, forward, loss, AdamW update — is one
jitted XLA program per step (train_step_superpoint). The reference ships
this model pretrained-only (imcui/hloc/extractors/superpoint.py:33-57);
training it in-framework makes the whole flagship stack (SuperPoint →
LightGlue, see train/step.py) trainable from scratch on TPU.
"""

import functools

import jax
import jax.numpy as jnp

try:
    import optax
except Exception:  # pragma: no cover
    optax = None

from ..models.extractors import superpoint as sp
from ..models.layers import conv2d, relu
from . import data, homography


def detector_logits(params, images):
    """(B, 1, H, W) → per-cell 65-class logits (B, H/8, W/8, 65)."""
    feats = sp.backbone(params, images.transpose(0, 2, 3, 1))
    cpa = relu(conv2d(params["convPa"], feats))
    return conv2d(params["convPb"], cpa).astype(jnp.float32)


def descriptor_cells(params, images):
    """(B, 1, H, W) → L2-normalised cell descriptors (B, H/8, W/8, 256)."""
    feats = sp.backbone(params, images.transpose(0, 2, 3, 1))
    return sp.dense_descriptors(params, feats)


def corner_cell_labels(corners, mask, h, w):
    """GT corners (N, 2) xy + validity → (H/8, W/8) int32 labels in
    [0, 64]: the in-cell position of a corner, 64 (dustbin) for empty
    cells. When several corners land in one cell the highest slot index
    wins (the published labels keep one corner per cell)."""
    hc, wc = h // 8, w // 8
    xi = jnp.clip(jnp.round(corners[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(corners[:, 1]).astype(jnp.int32), 0, h - 1)
    cell = (yi // 8) * wc + (xi // 8)
    inpos = (yi % 8) * 8 + (xi % 8)
    labels = jnp.full((hc * wc,), 64, jnp.int32)
    labels = labels.at[jnp.where(mask, cell, hc * wc)].set(
        inpos, mode="drop")
    return labels.reshape(hc, wc)


def detector_loss(logits, labels):
    """Per-cell 65-way cross-entropy, mean over cells."""
    ll = jax.nn.log_softmax(logits, -1)
    picked = jnp.take_along_axis(ll, labels[..., None], -1)[..., 0]
    return -picked.mean()


def descriptor_hinge_loss(desc0, desc1, H, m_pos=1.0, m_neg=0.2,
                          lambda_d=250.0):
    """Dense cell-pair hinge (paper eq. 4). desc0/1: (Hc, Wc, 256);
    H maps image-0 pixels to image-1 pixels."""
    hc, wc, d = desc0.shape
    ys, xs = jnp.mgrid[0:hc, 0:wc].astype(jnp.float32)
    centers = jnp.stack([xs * 8 + 4, ys * 8 + 4], -1).reshape(-1, 2)
    warped = homography.warp_points(H, centers)      # image-0 centers → 1
    d2 = ((warped[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    s = (d2 <= 64.0).astype(jnp.float32)             # within 8 px
    dot = jnp.einsum("nd,md->nm", desc0.reshape(-1, d),
                     desc1.reshape(-1, d),
                     preferred_element_type=jnp.float32)
    loss = (lambda_d * s * jnp.maximum(0.0, m_pos - dot)
            + (1.0 - s) * jnp.maximum(0.0, dot - m_neg))
    return loss.mean(), s.sum()


def sp_pair_loss(params, image, corners, cmask, H, lambda_desc=1.0):
    """Both-view detector CE + descriptor hinge for one labelled image
    and its warp. image: (1, H, W) single-channel."""
    h, w = image.shape[-2:]
    warped_img = homography.warp_images(image[None], H[None])[0]
    both = jnp.stack([image, warped_img])            # (2, 1, H, W)
    logits = detector_logits(params, both)
    desc = descriptor_cells(params, both)

    wc_pts = homography.warp_points(H, corners)
    wmask = cmask & ((wc_pts[:, 0] >= 0) & (wc_pts[:, 0] <= w - 1)
                     & (wc_pts[:, 1] >= 0) & (wc_pts[:, 1] <= h - 1))
    lab0 = corner_cell_labels(corners, cmask, h, w)
    lab1 = corner_cell_labels(wc_pts, wmask, h, w)
    det = detector_loss(logits[0], lab0) + detector_loss(logits[1], lab1)
    desc_l, n_pos = descriptor_hinge_loss(desc[0], desc[1], H)
    return det + lambda_desc * desc_l, {
        "det_ce": det, "desc_hinge": desc_l, "n_desc_pos": n_pos}


def train_step_superpoint(params, opt_state, key, *, optimizer, batch=4,
                          h=160, w=160, n_shapes=24, lambda_desc=1.0,
                          homography_kwargs=None):
    """One optimisation step: fresh synthetic corner images + fresh
    warps → joint detector/descriptor loss → AdamW update. Fully
    on-device; jit via make_sp_train_step."""
    kd, kh = jax.random.split(key)
    images, corners, cmask = data.synthetic_images_with_corners(
        kd, batch, h, w, n_shapes)
    Hs = homography.sample_homographies(
        kh, batch, w, h, **(homography_kwargs or {}))

    def loss_fn(p):
        loss, aux = jax.vmap(
            lambda im, c, m, Hm: sp_pair_loss(p, im, c, m, Hm,
                                              lambda_desc))(
            images, corners, cmask, Hs)
        return loss.mean(), jax.tree_util.tree_map(jnp.mean, aux)

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, {"loss": loss, **aux,
                               "grad_norm": optax.global_norm(grads)}


def make_sp_train_step(optimizer, **static_kwargs):
    fn = functools.partial(train_step_superpoint, optimizer=optimizer,
                           **static_kwargs)
    return jax.jit(fn)


def init_sp_train_state(rng=None, lr=1e-4):
    """(sp_params, opt_state, optimizer) for train_step_superpoint."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    params = sp.init_params(rng)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adamw(lr, weight_decay=1e-5))
    return params, optimizer.init(params), optimizer
