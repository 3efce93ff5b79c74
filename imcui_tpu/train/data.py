"""Synthetic corner-rich training images, generated on device.

Offline stand-in for the homography-pretraining photo corpus (the
published recipe uses 170k Oxford-Paris 1M images; this environment has
no egress). Each image is a smooth random field plus axis-aligned
rectangles and circles at random positions/intensities — enough local
structure that a conv detector fires and descriptors at corresponding
warped locations correlate. Fully jittable, so the generator fuses into
the training step; swap in a real image source by feeding (B, 1, H, W)
float32 [0, 1] batches to train_step directly.
"""

import jax
import jax.numpy as jnp


def synthetic_images_with_corners(key, batch, h, w, n_shapes=24):
    """MagicPoint-style synthetic corpus WITH ground-truth corners.

    Returns (images (B, 1, h, w), corners (B, 4·n_shapes, 2) xy,
    mask (B, 4·n_shapes) bool). Rectangles contribute their 4 corners;
    discs contribute none (their slots are masked out). Shapes composite
    ADDITIVELY, so an overlapped rectangle's edges (and corners) stay
    visible as intensity steps; overlaps also create unlabelled
    incidental corners — that label incompleteness is accepted (the
    published MagicPoint corpus renders with exact bookkeeping; this
    generator trades that for staying fully on-device)."""
    imgs, ctr, size, inten = _synthetic_fields(key, batch, h, w, n_shapes)
    sx = size[..., 0:1]
    sy = size[..., 1:2]
    offs = jnp.stack([
        jnp.concatenate([-sx, -sy], -1), jnp.concatenate([sx, -sy], -1),
        jnp.concatenate([-sx, sy], -1), jnp.concatenate([sx, sy], -1),
    ], 2)                                    # (B, S, 4, 2)
    corners = (ctr[:, :, None, :] + offs).reshape(batch, -1, 2)
    is_rect = ~(inten[..., 1] > 0)           # matches the paint rule
    vis = jnp.abs(inten[..., 0]) > 0.08      # too-faint shapes: no corner
    m = jnp.repeat(is_rect & vis, 4, axis=1)
    inb = ((corners[..., 0] >= 2) & (corners[..., 0] <= w - 3)
           & (corners[..., 1] >= 2) & (corners[..., 1] <= h - 3))
    return imgs[:, None], corners, m & inb


def synthetic_images(key, batch, h, w, n_shapes=24):
    """(batch, 1, h, w) float32 in [0, 1]."""
    return _synthetic_fields(key, batch, h, w, n_shapes)[0][:, None]


def _synthetic_fields(key, batch, h, w, n_shapes=24):
    kb, kc, kr, ki, kk = jax.random.split(key, 5)
    ys, xs = jnp.mgrid[0:h, 0:w].astype(jnp.float32)

    # low-frequency background: sum of 3 random sinusoid products
    f = jax.random.uniform(kb, (batch, 3, 4), minval=0.5, maxval=3.0)
    ph = jax.random.uniform(kc, (batch, 3, 2), minval=0.0,
                            maxval=2 * jnp.pi)

    def bg(fi, pi):
        waves = jnp.sin(2 * jnp.pi * fi[:, 0:1, None] * xs[None] / w
                        + pi[:, 0:1, None]) \
            * jnp.sin(2 * jnp.pi * fi[:, 1:2, None] * ys[None] / h
                      + pi[:, 1:2, None])
        return waves.sum(0) * 0.08 + 0.45

    img = jax.vmap(bg)(f, ph)  # (B, h, w)

    # shapes: rectangles (sharp corners) + discs (curvature)
    ctr = jax.random.uniform(kr, (batch, n_shapes, 2)) \
        * jnp.asarray([w, h], jnp.float32)
    size = jax.random.uniform(ki, (batch, n_shapes, 2), minval=0.02,
                              maxval=0.12) * jnp.asarray(
                                  [w, h], jnp.float32)
    inten = jax.random.uniform(kk, (batch, n_shapes, 2), minval=-0.45,
                               maxval=0.45)

    def paint(im, c, s, a):
        def shape(im, i):
            dx = jnp.abs(xs - c[i, 0])
            dy = jnp.abs(ys - c[i, 1])
            rect = (dx < s[i, 0]) & (dy < s[i, 1])
            disc = (dx ** 2 + dy ** 2) < (s[i, 0] * s[i, 1])
            use_disc = a[i, 1] > 0
            m = jnp.where(use_disc, disc, rect)
            return im + m * a[i, 0]

        return jax.lax.fori_loop(
            0, n_shapes, lambda i, acc: shape(acc, i), im)

    img = jax.vmap(paint)(img, ctr, size, inten)
    return jnp.clip(img, 0.0, 1.0), ctr, size, inten
