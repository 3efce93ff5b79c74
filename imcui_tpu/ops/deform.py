"""Deformable 2-D convolution (torchvision ``deform_conv2d`` semantics),
TPU-native.

Used by ALIKED's dcn ResBlocks (reference wrapper contract:
imcui/hloc/extractors/aliked.py:12-31; the upstream DeformableConv2d
pairs a regular offset-predicting conv with ``torchvision.ops.
deform_conv2d``). On GPU this is a custom scatter/gather kernel; on TPU
we lower it as k² dense bilinear gathers + one einsum per tap — the
gathers vectorise over the full map and the channel contraction stays
on the MXU. Exactness vs torchvision is pinned by
tests/test_torch_parity3.py.

Conventions (torchvision):
- ``offsets`` has 2·kh·kw channels ordered (Δy, Δx) per kernel tap in
  row-major tap order;
- sampling uses bilinear interpolation with ZERO padding outside the
  feature map (partial corner contributions at the border);
- stride 1, symmetric padding kh//2 (the only configuration ALIKED
  uses).
"""

import jax
import jax.numpy as jnp


def _bilinear_zeros(x, py, px):
    """Sample x (H, W, C) at float coords (py, px) each (...,) with
    zero padding outside the map → (..., C)."""
    h, w, _ = x.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = (py - y0)[..., None]
    wx = (px - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = x[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb[..., None], v, 0.0)

    return (tap(y0i, x0i) * (1 - wy) * (1 - wx)
            + tap(y0i, x0i + 1) * (1 - wy) * wx
            + tap(y0i + 1, x0i) * wy * (1 - wx)
            + tap(y0i + 1, x0i + 1) * wy * wx)


def deform_conv2d(x, offsets, w, b=None):
    """x: (B, H, W, Cin); offsets: (B, H, W, 2·kh·kw) torchvision
    layout; w: (kh, kw, Cin, Cout) → (B, H, W, Cout)."""
    bsz, h, w_, cin = x.shape
    kh, kw, _, cout = w.shape
    iy = jnp.arange(h, dtype=jnp.float32)[:, None]
    ix = jnp.arange(w_, dtype=jnp.float32)[None, :]
    out = jnp.zeros((bsz, h, w_, cout), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            k = i * kw + j
            dy = offsets[..., 2 * k]
            dx = offsets[..., 2 * k + 1]
            py = iy[None] + (i - kh // 2) + dy
            px = ix[None] + (j - kw // 2) + dx
            samp = jax.vmap(_bilinear_zeros)(x, py, px)
            out = out + jnp.einsum(
                "bhwc,cd->bhwd", samp, w[i, j],
                preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b
    return out.astype(x.dtype)
