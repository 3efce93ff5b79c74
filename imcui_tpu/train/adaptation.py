"""Homographic adaptation: self-distilling SuperPoint onto real photos.

The published SuperPoint recipe (DeTone et al., CVPR-W 2018 §5) has two
stages: MagicPoint training on a synthetic corner corpus
(train/superpoint.py), then *homographic adaptation* — the synthetic
detector labels real photographs by averaging its own detections over
many random homographies of each image, and training continues on those
pseudo-ground-truth corners. The reference webui ships the result
pretrained-only (imcui/hloc/extractors/superpoint.py:33-57); this module
implements the adaptation stage natively so the framework can produce
real learned weights with zero checkpoint egress.

TPU shape: the per-image aggregation (K warps → K detector forwards →
K inverse warps → running mean) is ONE jitted program — the warps are
batched into the detector's leading axis so the conv trunk runs K-wide
on the MXU, and both warp directions reuse train/homography.warp_images
(pure XLA gathers). Corner extraction (NMS + top-k) is jitted too, so
labelling an N-image corpus is N program invocations, no host compute.
"""

import functools

import jax
import jax.numpy as jnp

from ..models.extractors import superpoint as sp
from . import homography


def detector_heatmap(params, images):
    """(B, 1, H, W) float32 [0,1] → (B, H, W) corner probabilities."""
    feats = sp.backbone(params, images.transpose(0, 2, 3, 1))
    return sp.dense_scores(params, feats)


@functools.partial(jax.jit, static_argnames=("n_homog",))
def adapt_heatmap(params, image, key, n_homog=32):
    """Aggregated corner probability map for ONE image (1, H, W).

    Detections are averaged over ``n_homog`` views (the identity plus
    n_homog-1 random homographies): each warped view goes through the
    detector, its heatmap is masked to the warp's valid region and
    warped back into the source frame, and the per-pixel mean is taken
    over the views that actually observe the pixel (border pixels are
    seen by fewer views; dividing by coverage keeps their scale
    comparable — the published aggregation does the same).
    """
    _, h, w = image.shape
    Hs = homography.sample_homographies(key, n_homog, w, h)
    Hs = Hs.at[0].set(jnp.eye(3, dtype=Hs.dtype))

    batch = jnp.tile(image[None], (n_homog, 1, 1, 1))   # (K, 1, H, W)
    warped = homography.warp_images(batch, Hs)
    heat = detector_heatmap(params, warped)             # (K, H, W)

    # validity of each warped view (zeros where the warp sampled outside
    # the source image — detector output there is border garbage)
    ones = jnp.ones((n_homog, 1, h, w), jnp.float32)
    cover = homography.warp_images(ones, Hs)[:, 0]      # (K, H, W)
    cover = (cover > 0.999).astype(jnp.float32)

    # back-warp into the source frame: warp_images(x, H) computes
    # out(H·p) = x(p), so warping with H⁻¹ places heat(H·p) at p.
    Hinv = jnp.linalg.inv(Hs)
    stacked = jnp.stack([heat * cover, cover], 1)        # (K, 2, H, W)
    back = homography.warp_images(stacked, Hinv)
    heat_sum = back[:, 0].sum(0)
    seen = back[:, 1].sum(0)
    return heat_sum / jnp.maximum(seen, 1e-6)


@functools.partial(
    jax.jit, static_argnames=("n_max", "nms_radius", "border"))
def extract_corners(heat, n_max=512, nms_radius=4, threshold=0.015,
                    border=8):
    """Pseudo-GT corners from an aggregated heatmap.

    (H, W) → (corners (n_max, 2) xy float32, mask (n_max,) bool):
    local maxima (square NMS window of radius ``nms_radius``) above
    ``threshold``, borders excluded, strongest ``n_max`` kept.
    """
    h, w = heat.shape
    pooled = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max,
        (2 * nms_radius + 1, 2 * nms_radius + 1), (1, 1), "SAME")
    ys, xs = jnp.mgrid[0:h, 0:w]
    keep = ((heat >= pooled) & (heat >= threshold)
            & (xs >= border) & (xs < w - border)
            & (ys >= border) & (ys < h - border))
    scores = jnp.where(keep, heat, -1.0).reshape(-1)
    vals, idx = jax.lax.top_k(scores, n_max)
    corners = jnp.stack(
        [(idx % w).astype(jnp.float32), (idx // w).astype(jnp.float32)],
        -1)
    return corners, vals > 0.0


def label_images(params, images, key, n_homog=32, n_max=512,
                 nms_radius=4, threshold=0.015):
    """Label a whole corpus: images (N, 1, H, W) → (corners (N, n_max, 2),
    mask (N, n_max)). One jitted program per image (K-wide inside)."""
    all_c, all_m = [], []
    for i in range(images.shape[0]):
        key, k = jax.random.split(key)
        heat = adapt_heatmap(params, images[i], k, n_homog=n_homog)
        c, m = extract_corners(heat, n_max=n_max, nms_radius=nms_radius,
                               threshold=threshold)
        all_c.append(c)
        all_m.append(m)
    return jnp.stack(all_c), jnp.stack(all_m)


def train_step_superpoint_real(params, opt_state, key, images, corners,
                               cmask, *, optimizer, lambda_desc=1.0,
                               homography_kwargs=None):
    """One update on a REAL labelled batch: fresh random warp per image,
    joint detector CE + descriptor hinge (train/superpoint.sp_pair_loss —
    identical loss to the synthetic stage, only the corner source
    differs). images (B, 1, H, W), corners (B, N, 2), cmask (B, N)."""
    import optax

    from . import superpoint as spt

    b, _, h, w = images.shape
    Hs = homography.sample_warps(
        key, b, w, h, **(homography_kwargs or {}))

    def loss_fn(p):
        loss, aux = jax.vmap(
            lambda im, c, m, Hm: spt.sp_pair_loss(p, im, c, m, Hm,
                                                  lambda_desc))(
            images, corners, cmask, Hs)
        return loss.mean(), jax.tree_util.tree_map(jnp.mean, aux)

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, {"loss": loss, **aux}


def make_real_train_step(optimizer, **static_kwargs):
    fn = functools.partial(train_step_superpoint_real,
                           optimizer=optimizer, **static_kwargs)
    return jax.jit(fn)
