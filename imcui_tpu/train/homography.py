"""On-device random homographies + batched inverse warps (all jittable).

The published LightGlue/SuperPoint recipes synthesise supervision from
known planar warps; here both the sampling and the image warp are pure
XLA (no cv2, no host round-trip), so the whole augmentation pipeline
fuses into the training step. Point convention matches the rest of the
repo: xy pixel coordinates, origin at the top-left pixel *center*
(eval/warp.py uses the same convention via cv2).
"""

import jax
import jax.numpy as jnp


def sample_homographies(key, batch, w, h, max_angle=25.0,
                        scale_range=(0.8, 1.25), max_translation=0.08,
                        perspective=2e-4):
    """(batch, 3, 3) random invertible warps about the image center:
    rotation ±max_angle°, log-uniform scale, translation as a fraction
    of the image size, and a small projective term — the same family as
    eval/warp.py:make_homographies / ui/examples.py, but sampled on
    device so the training step stays one program."""
    ka, ks, kt, kp = jax.random.split(key, 4)
    ang = jax.random.uniform(ka, (batch,), minval=-max_angle,
                             maxval=max_angle) * (jnp.pi / 180.0)
    logs = jax.random.uniform(
        ks, (batch,), minval=jnp.log(scale_range[0]),
        maxval=jnp.log(scale_range[1]))
    s = jnp.exp(logs)
    t = jax.random.uniform(kt, (batch, 2), minval=-max_translation,
                           maxval=max_translation) * jnp.asarray(
                               [w, h], jnp.float32)
    p = jax.random.uniform(kp, (batch, 2), minval=-perspective,
                           maxval=perspective)

    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    # similarity about the center, then translation; the projective row
    # is recentered so the image center is a fixed point of the
    # perspective term (w₂·center = 1 keeps the warp well-conditioned)
    a = s * ca
    b = s * sa
    row0 = jnp.stack([a, -b, cx - a * cx + b * cy + t[:, 0]], -1)
    row1 = jnp.stack([b, a, cy - b * cx - a * cy + t[:, 1]], -1)
    row2 = jnp.stack([p[:, 0], p[:, 1],
                      1.0 - p[:, 0] * cx - p[:, 1] * cy], -1)
    return jnp.stack([row0, row1, row2], 1)


def warp_points(H, pts):
    """Projective transform: pts (N, 2) xy → (N, 2) under H (3, 3)."""
    x = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], -1) @ H.T
    z = x[:, 2:]
    z = jnp.where(jnp.abs(z) < 1e-9, jnp.where(z < 0, -1e-9, 1e-9), z)
    return x[:, :2] / z


def warp_images(images, Hs):
    """Batched inverse bilinear warp: images (B, C, H, W) → warped so
    that ``out(H·x) = in(x)`` (zeros outside), matching
    cv2.warpPerspective(image, H) up to bilinear sampling."""
    b, c, h, w = images.shape
    Hinv = jnp.linalg.inv(Hs.astype(jnp.float32))

    ys, xs = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    grid = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)  # (HW, 2) xy

    def one(img, hi):
        src = warp_points(hi, grid)  # (HW, 2) xy in the source image
        x, y = src[:, 0], src[:, 1]
        valid = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
        x0i = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
        y0i = jnp.clip(jnp.floor(y), 0, h - 2).astype(jnp.int32)
        # fractional offsets against the CLIPPED base: at the exact last
        # row/column floor(x) = w-1 but the base tap is w-2, so fx must
        # be 1 there (an offset against floor(x) reads pixel w-2 with
        # full weight — an off-by-one found by the identity-warp test)
        fx, fy = x - x0i, y - y0i
        flat = img.reshape(c, -1)  # (C, H*W)
        base = y0i * w + x0i

        def tap(off, wgt):
            return flat[:, base + off] * wgt

        out = (tap(0, (1 - fx) * (1 - fy)) + tap(1, fx * (1 - fy))
               + tap(w, (1 - fx) * fy) + tap(w + 1, fx * fy))
        out = jnp.where(valid[None, :], out, 0.0)
        return out.reshape(c, h, w)

    return jax.vmap(one)(images, Hinv)
