"""torch.nn.functional.grid_sample semantics in JAX (sparse points).

Several upstream models sample dense maps at sparse keypoints through
``F.grid_sample`` with model-specific conventions (align_corners flag,
bilinear vs bicubic kernel, zeros padding). Checkpoint fidelity requires
matching those exactly — e.g. XFeat normalises the grid by (W−1, H−1)
(align_corners=True convention) but then calls grid_sample with
``align_corners=False`` and a BICUBIC kernel (verlab accelerated_features
``InterpolateSparse2d``; reference wrapper imcui/hloc/extractors/xfeat.py).

TPU notes: sparse sampling is a fixed-fanout gather (4 taps bilinear, 16
bicubic) + weighted sum — dense, fixed-shape, vmappable. Zeros padding is
a weight mask, not a data pad.
"""

import jax.numpy as jnp


def _unnormalize(g, size, align_corners):
    """grid coord in [-1, 1] → input pixel coordinate (torch rules)."""
    if align_corners:
        return (g + 1.0) * 0.5 * (size - 1)
    return ((g + 1.0) * size - 1.0) * 0.5


def _cubic_kernel(s, a=-0.75):
    """Cubic convolution kernel (torch bicubic uses a = −0.75)."""
    s = jnp.abs(s)
    s2, s3 = s * s, s * s * s
    w1 = (a + 2.0) * s3 - (a + 3.0) * s2 + 1.0          # |s| <= 1
    w2 = a * s3 - 5.0 * a * s2 + 8.0 * a * s - 4.0 * a  # 1 < |s| < 2
    return jnp.where(s <= 1.0, w1, jnp.where(s < 2.0, w2, 0.0))


def grid_sample(fmap, grid, mode="bilinear", align_corners=False):
    """Sample ``fmap`` (H, W, C) at ``grid`` (..., 2) of (gx, gy) in
    [-1, 1]. Zeros padding (out-of-range taps contribute 0), matching
    ``F.grid_sample(..., padding_mode="zeros")``. Returns (..., C)."""
    h, w, _ = fmap.shape
    ix = _unnormalize(grid[..., 0], w, align_corners)
    iy = _unnormalize(grid[..., 1], h, align_corners)

    if mode == "nearest":
        # torch rounds half away from zero via floor(x + 0.5)
        x0 = jnp.floor(ix + 0.5).astype(jnp.int32)
        y0 = jnp.floor(iy + 0.5).astype(jnp.int32)
        inb = (x0 >= 0) & (x0 < w) & (y0 >= 0) & (y0 < h)
        val = fmap[jnp.clip(y0, 0, h - 1), jnp.clip(x0, 0, w - 1)]
        return jnp.where(inb[..., None], val, 0.0)

    if mode == "bilinear":
        taps, r = 2, 0
        x0 = jnp.floor(ix).astype(jnp.int32)
        y0 = jnp.floor(iy).astype(jnp.int32)
        tx = ix - x0
        ty = iy - y0
        wx = jnp.stack([1.0 - tx, tx], -1)              # (..., 2)
        wy = jnp.stack([1.0 - ty, ty], -1)
    elif mode == "bicubic":
        taps, r = 4, 1
        x0 = jnp.floor(ix).astype(jnp.int32)
        y0 = jnp.floor(iy).astype(jnp.int32)
        tx = ix - x0
        ty = iy - y0
        offs = jnp.arange(-1, 3, dtype=jnp.float32)
        wx = _cubic_kernel(tx[..., None] - offs)        # (..., 4)
        wy = _cubic_kernel(ty[..., None] - offs)
    else:
        raise ValueError(f"unknown mode {mode}")

    # taps gather ROWS of the flattened map (one 1-D index vector):
    # the 2-D advanced-indexing form lowers to a slower two-coordinate
    # gather on TPU (measured on the RoMa refiner pyramid, r3)
    lead = ix.shape
    fflat = fmap.reshape(h * w, -1)
    out = 0.0
    for j in range(taps):
        for i in range(taps):
            xi = x0 + (i - r)
            yi = y0 + (j - r)
            inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            q = (jnp.clip(yi, 0, h - 1) * w
                 + jnp.clip(xi, 0, w - 1)).reshape(-1)
            val = jnp.take(fflat, q, axis=0).reshape(
                lead + (fmap.shape[-1],))
            wgt = wy[..., j] * wx[..., i] * inb
            out = out + val * wgt[..., None]
    return out


def xfeat_grid(kpts, h, w):
    """XFeat's InterpolateSparse2d grid: pixel coords normalised by
    (W−1, H−1) — the align_corners=True convention — but consumed by
    grid_sample(align_corners=False). kpts: (..., 2) xy in full-res px."""
    return 2.0 * kpts / jnp.asarray([w - 1, h - 1], jnp.float32) - 1.0
