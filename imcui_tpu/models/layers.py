"""Functional NN building blocks with explicit param pytrees.

Design: every layer is a pure function ``layer(params, x)`` where params is a
plain nested dict of jnp arrays whose keys mirror the torch ``state_dict``
naming of the corresponding upstream model. That makes torch→JAX weight
conversion mechanical (see utils/weights.py) while keeping the compute path
100% JAX/XLA.

Layout: activations are NHWC (TPU-native; XLA tiles the C=128 lane dim onto
the MXU/VPU), conv kernels are HWIO. The (B, C, H, W) reference convention
is converted at model entry only.
"""

import jax
import jax.numpy as jnp
from jax import lax


def _torch_same_padding(kh, kw, d):
    """Torch-style symmetric k//2 padding for the effective kernel."""
    eh = (kh - 1) * d[0] + 1
    ew = (kw - 1) * d[1] + 1
    return ((eh // 2, eh // 2), (ew // 2, ew // 2))


def conv2d(p, x, stride=1, padding="SAME", dilation=1, groups=1):
    """2-D convolution. p: {"w": (kh, kw, cin/groups, cout), "b": (cout,)?};
    x: (B, H, W, C). groups=C with cout=C is a depthwise conv.

    A tree quantised by ``quantize_conv_int8`` (key "w_q") takes the
    W8A8 dynamic-quantisation path instead (see ``_conv2d_int8``).

    ``padding="SAME"`` means TORCH-style symmetric ``k//2`` padding, not
    XLA SAME: for strided convs XLA SAME pads asymmetrically (e.g. 0/1
    for a 3x3 stride-2, 2/3 for a 7x7 stride-2) while torch pads k//2 on
    both sides — every upstream checkpoint was trained with the latter
    (caught by tests/test_torch_parity.py's LoFTR backbone fixture; the
    two conventions agree at stride 1 with odd kernels)."""
    if "w_q" in p:
        return _conv2d_int8(p, x, stride, padding, dilation, groups)
    s = (stride, stride) if isinstance(stride, int) else stride
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    if x.dtype != p["w"].dtype:
        # the weight dtype is the precision policy: a bf16-cast param tree
        # makes the whole conv path bf16 even where an upstream op (f32
        # image normalisation, f32 LN statistics) re-upcast the activation
        x = x.astype(p["w"].dtype)
    if padding == "SAME":
        padding = _torch_same_padding(*p["w"].shape[:2], d)
    out = lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=s,
        padding=padding,
        rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "b" in p and p["b"] is not None:
        out = out + p["b"]
    return out


def depthwise_conv(p, x):
    """Depthwise k×k stride-1 conv as shift-and-accumulate.

    p: {"w": (kh, kw, 1, C), "b": (C,)?}; x: (B, H, W, C). Same math as
    ``conv2d(p, x, groups=C)`` with torch-SAME padding, but lowered as
    k² fused multiply-adds instead of a feature_group_count=C
    convolution — XLA serialises high-group-count convs on TPU (measured
    r2: group-serial lowering 15.8 vs 8.6 ms; r3: RoMa's 9-deep
    1377-group refiner stacks dominated the 154 ms pair time). Products
    are taken in the weight dtype, accumulation in f32.
    """
    kh, kw, _, c = p["w"].shape
    b, h, w, _ = x.shape
    if x.dtype != p["w"].dtype:
        x = x.astype(p["w"].dtype)
    xp = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2),
                     (0, 0)))
    acc = jnp.zeros((b, h, w, c), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            acc = acc + (xp[:, i:i + h, j:j + w] * p["w"][i, j, 0]
                         ).astype(jnp.float32)
    out = acc.astype(x.dtype)
    if "b" in p and p["b"] is not None:
        out = out + p["b"]
    return out


def linear(p, x):
    """p: {"w": (din, dout), "b": (dout,)?}; x: (..., din).
    A tree quantised by ``quantize_linear_int8`` (key "w_q") takes the
    W8A8 dynamic-quantisation path instead."""
    if "w_q" in p:
        return _linear_int8(p, x).astype(x.dtype)
    out = x @ p["w"]
    if "b" in p and p["b"] is not None:
        out = out + p["b"]
    return out


def quantize_linear_int8(p):
    """Symmetric per-output-channel int8 weight quantisation of a linear
    param dict. Returns {"w_q": int8 (din, dout), "w_s": f32 (dout,),
    "b": …} — ``linear`` dispatches on the presence of "w_q" and runs
    the matmul on the MXU's int8 path with dynamic per-row activation
    scales (serving-time W8A8; see ``linear``)."""
    w = p["w"].astype(jnp.float32)
    s = jnp.maximum(jnp.abs(w).max(0), 1e-12) / 127.0  # (dout,)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    out = {"w_q": q, "w_s": s}
    if "b" in p and p["b"] is not None:
        out["b"] = p["b"]
    return out


def _linear_int8(p, x):
    """W8A8 dynamic-quantised matmul: per-row (token) activation scales,
    per-column weight scales, int8×int8→int32 on the MXU. Measured ~2.7×
    the bf16 MXU rate at ViT-class widths (tools/try_int8.py); the
    max-abs reduction + casts are VPU work fused around the matmul."""
    shape = x.shape
    xf = x.reshape(-1, shape[-1]).astype(jnp.float32)
    sx = jnp.maximum(jnp.abs(xf).max(-1, keepdims=True), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = lax.dot_general(xq, p["w_q"], (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * sx * p["w_s"]
    if "b" in p and p["b"] is not None:
        out = out + p["b"]
    return out.reshape(*shape[:-1], -1)


def quantize_conv_int8(p):
    """Symmetric per-output-channel int8 quantisation of a conv param
    dict {"w": (kh, kw, cin, cout), "b"?}. Returns {"w_q", "w_s", "b"?};
    ``conv2d`` dispatches on "w_q" (W8A8 serving — VERDICT r4 weak #1:
    the HBM-bound conv trunks were the untried int8 lever)."""
    w = p["w"].astype(jnp.float32)
    s = jnp.maximum(jnp.abs(w).max((0, 1, 2)), 1e-12) / 127.0  # (cout,)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    out = {"w_q": q, "w_s": s}
    if "b" in p and p["b"] is not None:
        out["b"] = p["b"]
    return out


def _conv2d_int8(p, x, stride, padding, dilation, groups):
    """W8A8 conv: per-tensor dynamic activation scale (a per-pixel scale
    would vary across each receptive field, so per-tensor is the exact
    cheap choice for convs), per-output-channel weight scales,
    int8×int8→int32 on the MXU. Symmetric quantisation keeps the zero
    point at 0, so SAME zero-padding stays exact in the quantised
    domain. Measured rates per trunk shape: tools/try_int8_conv.py."""
    s = (stride, stride) if isinstance(stride, int) else stride
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    if padding == "SAME":
        padding = _torch_same_padding(*p["w_q"].shape[:2], d)
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.abs(xf).max(), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = lax.conv_general_dilated(
        xq, p["w_q"], window_strides=s, padding=padding, rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (sx * p["w_s"])
    if "b" in p and p["b"] is not None:
        out = out + p["b"]
    return out.astype(x.dtype)


def apply_precision(tree, precision, min_dim=256, conv_min_ch=None):
    """Serving-time precision transform of a whole param pytree.

    - ``None`` / ``"f32"``: identity.
    - ``"bf16"``: cast float leaves to bfloat16 (precision-sensitive ops
      upcast internally: LN/BN statistics, depthwise accumulation).
    - ``"int8"``: quantise every *eligible* linear dict — ``{"w": 2-D,
      "b"?}`` with min(din, dout) >= ``min_dim`` — via
      ``quantize_linear_int8`` (from the full-precision weights, before
      any cast), then bf16-cast everything else. The threshold keeps
      narrow heads/tails in bf16: the MXU int8 rate only beats bf16 at
      wide output dims (BASELINE.md: +13% at N=128 vs ~2.7x at N>=1024;
      a full ViT-L block forward measures 1.25x, 25.0->20.1 ms at
      N=1664 — tools/try_vit_int8.py).
    - ``conv_min_ch`` (int8 only): additionally quantise conv dicts —
      ``{"w": 4-D, "b"?}`` with min(cin, cout) >= conv_min_ch — via
      ``quantize_conv_int8``. Off (None) by default: XLA:TPU lowers int8
      convs through an int8 MXU path whose win is shape-dependent
      (measured per trunk shape in tools/try_int8_conv.py); tiers opt in
      via conf["int8_conv_min_ch"] where the A/B shows a win. Depthwise
      convs (cin==1 per group) are excluded by construction.
    """
    if precision in (None, "f32", "float32"):
        return tree
    if precision not in ("bf16", "bfloat16", "int8"):
        raise ValueError(f"unknown precision {precision!r}")

    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            return leaf.astype(jnp.bfloat16)
        return leaf

    def walk(node):
        if isinstance(node, dict):
            if (precision == "int8"
                    and set(node) <= {"w", "b"}
                    and hasattr(node.get("w"), "ndim")
                    and node["w"].ndim == 2
                    and min(node["w"].shape) >= min_dim):
                return quantize_linear_int8(node)
            if (precision == "int8"
                    and conv_min_ch is not None
                    and set(node) <= {"w", "b"}
                    and hasattr(node.get("w"), "ndim")
                    and node["w"].ndim == 4
                    and min(node["w"].shape[2:]) >= conv_min_ch):
                return quantize_conv_int8(node)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return cast(node)

    return walk(tree)


def layer_norm(p, x, eps=1e-5):
    """p: {"scale": (d,), "bias": (d,)}; normalise over the last dim.
    Statistics are always f32 (bf16 variance over wide dims is lossy);
    the output returns to x's dtype."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    out = (xf - mean) * lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def batch_norm_inference(p, x, eps=1e-5):
    """Inference-mode batchnorm over channel-last x.
    p: {"scale","bias","mean","var"} each (C,); scale/bias optional
    (torch ``affine=False`` layers ship only the running stats)."""
    inv = lax.rsqrt(p["var"] + eps)
    y = (x - p["mean"]) * inv
    if "scale" in p:
        y = y * p["scale"] + p["bias"]
    return y


def fold2x2(x):
    """(H, W, C) → (H/2, W/2, 4C): pack 2×2 pixel blocks into channels,
    sub-position-major layout c_f = (ay·2 + ax)·C + c. The 2-D analog of
    ``fold_width`` for narrow-channel stride-1 convs (RoMa/DKM's
    stride-1 refiner runs 5×5 convs at C≤24 over 560² — ~19% lane
    occupancy unfolded)."""
    h, w, c = x.shape
    return (x.reshape(h // 2, 2, w // 2, 2, c)
            .transpose(0, 2, 1, 3, 4)
            .reshape(h // 2, w // 2, 4 * c))


def unfold2x2(x):
    """Inverse of fold2x2."""
    h2, w2, c4 = x.shape
    c = c4 // 4
    return (x.reshape(h2, w2, 2, 2, c)
            .transpose(0, 2, 1, 3, 4)
            .reshape(h2 * 2, w2 * 2, c))


def fold2x2_conv5x5(p):
    """2×2-folded equivalent of a 5×5 SAME stride-1 conv: returns pf
    such that ``conv2d(pf, fold2x2(x)[None])[0] ==
    fold2x2(conv2d(p, x[None])[0])`` exactly, for even-H/W x.

    Derivation per dimension (fold 2, kernel 5, pad 2): original output
    o = 2i+a needs input r = o+t−2, t∈[0,5); s = a+t−2 ∈ [−2,3] spans
    folded offsets floor(s/2) ∈ {−1,0,1} → a 3×3 folded kernel over 4C
    channels. FLOPs grow 1.44× (the folded kernel is partly zeros) but
    run at 4× the lane occupancy — the same trade fold_width makes for
    the SuperPoint trunk (measured there: 13.8 → 5.7 ms)."""
    w = p["w"]
    kh, kw, cin, cout = w.shape
    assert kh == 5 and kw == 5, "fold2x2_conv5x5 expects a 5×5 kernel"
    wf = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for ay in range(2):
        for ax in range(2):
            for ty in range(5):
                for tx in range(5):
                    sy, sx = ay + ty - 2, ax + tx - 2
                    ky, kx = sy // 2, sx // 2  # floor div
                    apy, apx = sy - 2 * ky, sx - 2 * kx
                    ci = (apy * 2 + apx) * cin
                    co = (ay * 2 + ax) * cout
                    wf = wf.at[ky + 1, kx + 1, ci:ci + cin,
                               co:co + cout].set(w[ty, tx])
    pf = {"w": wf}
    if "b" in p and p["b"] is not None:
        pf["b"] = jnp.tile(p["b"], 4)
    return pf


def fold2x2_conv1x1(p):
    """2×2-folded 1×1 conv: block-diagonal over the 4 sub-positions."""
    w = p["w"][0, 0]  # (cin, cout)
    eye = jnp.eye(4, dtype=w.dtype)
    wf = jnp.einsum("ab,io->aibo", eye, w).reshape(
        1, 1, 4 * w.shape[0], 4 * w.shape[1])
    pf = {"w": wf}
    if "b" in p and p["b"] is not None:
        pf["b"] = jnp.tile(p["b"], 4)
    return pf


def fold2x2_bn(p):
    """2×2-folded inference batch-norm params (channel stats tiled)."""
    return {k: jnp.tile(v, 4) for k, v in p.items()}


def vmap_pairs(fn):
    """``jax.vmap`` over the leading pair-batch axis, bypassing vmap
    entirely at B=1. Measured r4 (tools/try_roma_novmap.py, real chip):
    the batched dimension pushes RoMa's fused-attention / gather-heavy
    program onto slower lowering paths — 98.2 ms/pair vmapped at B=1 vs
    80.9 unbatched, identical math. B=1 is the heavy tiers' serving
    point (B-scaling measured negative, BASELINE.md), so the bypass is
    the common case."""
    batched = jax.vmap(fn)

    def wrapper(*args):
        if all(hasattr(a, "shape") for a in args) and args[0].shape[0] == 1:
            out = fn(*(a[0] for a in args))
            return jax.tree_util.tree_map(lambda x: x[None], out)
        return batched(*args)

    return wrapper


def fold_width(x):
    """(B, H, W, C) → (B, H, W/2, 2C): pack horizontal pixel pairs into
    channels. TPU rationale: the MXU is 128 lanes wide, so convs with
    C<128 waste half the systolic array AND the lane-padded activations
    double HBM traffic. Folding doubles the conv FLOPs (the folded
    kernel is half zeros) but runs them at ~100% MXU utilisation —
    measured 13.8 ms → 5.7 ms for SuperPoint's conv1b at 8×1024²
    (tools/profile_trunk.py). Exact-equivalent, not an approximation."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unfold_width(x):
    """Inverse of fold_width."""
    b, h, w2, c2 = x.shape
    return x.reshape(b, h, w2 * 2, c2 // 2)


def fold_conv3x3(p):
    """Width-folded equivalent of a 3×3 SAME conv: returns params pf such
    that conv2d(pf, fold_width(x)) == fold_width(conv2d(p, x)) exactly,
    for even-width x. Derivation: output pixel 2w₂ takes taps from real
    pixels 2w₂−1..2w₂+1 = folded slots (w₂−1, hi), (w₂, lo), (w₂, hi);
    pixel 2w₂+1 takes (w₂, lo), (w₂, hi), (w₂+1, lo)."""
    w = p["w"]
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, "fold_conv3x3 expects a 3×3 kernel"
    wf = jnp.zeros((3, 3, 2 * cin, 2 * cout), w.dtype)
    # even outputs (folded cout 0:cout)
    wf = wf.at[:, 0, cin:, :cout].set(w[:, 0])
    wf = wf.at[:, 1, :cin, :cout].set(w[:, 1])
    wf = wf.at[:, 1, cin:, :cout].set(w[:, 2])
    # odd outputs (folded cout cout:2cout)
    wf = wf.at[:, 1, :cin, cout:].set(w[:, 0])
    wf = wf.at[:, 1, cin:, cout:].set(w[:, 1])
    wf = wf.at[:, 2, :cin, cout:].set(w[:, 2])
    pf = {"w": wf}
    if "b" in p and p["b"] is not None:
        pf["b"] = jnp.concatenate([p["b"], p["b"]])
    return pf


def max_pool_folded(x, refold=True):
    """2×2/stride-2 max-pool on a width-folded tensor. Input
    (B, H, W₂, 2C) [= real width 2W₂]; output (B, H/2, W₂/2, 2C) folded
    when refold else (B, H/2, W₂, C) unfolded.

    Lowering note (measured, tools/profile_trunk.py): the vertical max
    must be a reshape+reduce — strided slices (x[:, 0::2]) cost 8 ms vs
    3.2 ms at 8×1024² — and the refold reshape merges exact 128-lane
    tiles, which is free."""
    b, h, w2, c2 = x.shape
    c = c2 // 2
    v = x.reshape(b, h // 2, 2, w2, c2).max(2)   # vertical pairs
    m = jnp.maximum(v[..., :c], v[..., c:])      # horizontal pairs
    if refold:
        return m.reshape(b, h // 2, w2 // 2, c2)
    return m


def max_pool(x, window=2, stride=2):
    """x: (B, H, W, C)."""
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        padding="VALID",
    )


def max_pool3_s2(x):
    """torchvision stem max-pool: 3×3 window, stride 2, padding 1 —
    NOT equivalent to 2×2/s2 (same output shape on even inputs, different
    values at odd positions; checkpoint-fidelity class of bug pinned by
    tests/test_torch_parity2.py)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def relu(x):
    return jnp.maximum(x, 0)


def gelu(x):
    # exact (erf) variant: torch's nn.GELU() default, which is what every
    # upstream checkpoint was trained with — jax.nn.gelu defaults to the
    # tanh approximation (caught by tests/test_torch_parity.py's
    # LightGlue fixture as a ~1e-4 drift per FFN)
    return jax.nn.gelu(x, approximate=False)


def l2_normalize(x, axis=-1, eps=1e-8):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


# ---------------------------------------------------------------------------
# initialisers (used when pretrained weights are unavailable)
# ---------------------------------------------------------------------------

def init_conv(key, kh, kw, cin, cout, bias=True):
    k1, _ = jax.random.split(key)
    fan_in = kh * kw * cin
    w = jax.random.normal(k1, (kh, kw, cin, cout)) * jnp.sqrt(2.0 / fan_in)
    p = {"w": w.astype(jnp.float32)}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def init_linear(key, din, dout, bias=True):
    k1, _ = jax.random.split(key)
    w = jax.random.normal(k1, (din, dout)) * jnp.sqrt(1.0 / din)
    p = {"w": w.astype(jnp.float32)}
    if bias:
        p["b"] = jnp.zeros((dout,), jnp.float32)
    return p


def init_layer_norm(d):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}
