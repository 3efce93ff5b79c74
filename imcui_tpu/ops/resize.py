"""Torch-semantics image resize (``F.interpolate``).

Why not ``jax.image.resize``: its "cubic" method is the Keys kernel with
a = −0.5, while torch's ``upsample_bicubic2d`` uses a = −0.75 and
replicate-clamps out-of-range taps — every upstream checkpoint that
interleaves bicubic upsampling with convs (DeDoDe's cross-scale logit
accumulation, reference third_party DeDoDe decoder contract) was trained
with the latter, so the kernels must match exactly (same
checkpoint-fidelity class as the strided-conv padding bug pinned by
tests/test_torch_parity.py). Bilinear half-pixel resize is identical
between the two frameworks, so it routes to ``jax.image.resize``.

TPU shape: tap indices and cubic weights are computed at trace time with
numpy (sizes are static under jit), so the kernel lowers to 4 gathers +
a weighted sum per axis — no dynamic shapes, vmappable.
"""

import numpy as np

import jax
import jax.numpy as jnp


def _cubic_weights(src, a=-0.75):
    """Per-output-pixel 4-tap cubic convolution weights + base indices."""
    base = np.floor(src).astype(np.int64)
    t = src - base
    # offsets -1..2 relative to base; |x| distances per tap
    x = np.stack([t + 1.0, t, 1.0 - t, 2.0 - t], -1)
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a,
    )
    return base, w


def _axis_indices(n_in, n_out, align_corners):
    i = np.arange(n_out, dtype=np.float64)
    if align_corners and n_out > 1:
        src = i * (n_in - 1) / (n_out - 1)
    else:
        src = (i + 0.5) * n_in / n_out - 0.5
    return src


def _bicubic_1d(x, axis, n_out, align_corners):
    n_in = x.shape[axis]
    src = _axis_indices(n_in, n_out, align_corners)
    base, w = _cubic_weights(src)
    out = 0.0
    for tap in range(4):
        idx = np.clip(base + tap - 1, 0, n_in - 1)  # torch replicate-clamp
        gathered = jnp.take(x, jnp.asarray(idx), axis=axis)
        wt = jnp.asarray(w[:, tap], x.dtype)
        shape = [1] * x.ndim
        shape[axis] = n_out
        out = out + gathered * wt.reshape(shape)
    return out


def torch_interpolate(x, size, mode="bilinear", align_corners=False):
    """``F.interpolate(x, size, mode, align_corners)`` for channel-last
    ``x`` (..., H, W, C); ``size`` = (H_out, W_out). Modes: nearest /
    bilinear / bicubic."""
    h, w = size
    hw_axes = (x.ndim - 3, x.ndim - 2)
    if mode == "bicubic":
        return _bicubic_1d(
            _bicubic_1d(x, hw_axes[0], h, align_corners),
            hw_axes[1], w, align_corners)
    if mode == "nearest":
        # torch nearest (legacy) floors the scaled source index
        sy = np.floor(np.arange(h) * x.shape[hw_axes[0]] / h).astype(int)
        sx = np.floor(np.arange(w) * x.shape[hw_axes[1]] / w).astype(int)
        x = jnp.take(x, jnp.asarray(sy), axis=hw_axes[0])
        return jnp.take(x, jnp.asarray(sx), axis=hw_axes[1])
    if mode == "bilinear":
        if align_corners:
            # jax.image.resize has no align_corners: build taps manually
            out = x
            for axis, n_out in zip(hw_axes, (h, w)):
                n_in = out.shape[axis]
                src = _axis_indices(n_in, n_out, True)
                base = np.clip(np.floor(src).astype(np.int64), 0, n_in - 1)
                nxt = np.clip(base + 1, 0, n_in - 1)
                t = jnp.asarray(src - np.floor(src), out.dtype)
                shape = [1] * out.ndim
                shape[axis] = n_out
                out = (jnp.take(out, jnp.asarray(base), axis=axis)
                       * (1 - t).reshape(shape)
                       + jnp.take(out, jnp.asarray(nxt), axis=axis)
                       * t.reshape(shape))
            return out
        new_shape = list(x.shape)
        new_shape[hw_axes[0]], new_shape[hw_axes[1]] = h, w
        return jax.image.resize(x, tuple(new_shape), "bilinear")
    raise ValueError(f"unknown mode {mode}")
