"""DPT dense-prediction head (the DUSt3R/MASt3R pointmap head).

Re-implementation of the head used by the reference's dust3r submodule
(reference wrapper: imcui/hloc/matchers/duster.py:23-38 loads
``AsymmetricCroCo3DStereo`` whose ``downstream_head{1,2}`` is a
``PixelwiseTaskWithDPT``; published design: 4 hook projections at
[96, 192, 384, 768] channels, a 256-channel `scratch` pyramid with four
residual fusion blocks, and a 3-conv regression head). Param-tree keys
mirror the upstream state_dict (``act_postprocess``, ``scratch``,
``head``) so the rank-based auto-converter maps checkpoints 1:1.

TPU notes: the two ConvTranspose upsamplers have kernel == stride, so
they compile to a single einsum + depth-to-space (pure MXU work, no
scatter); bilinear resizes use explicit align-corners sampling to match
torch ``F.interpolate(..., align_corners=True)``.
"""

import jax
import jax.numpy as jnp

from ..layers import conv2d as _conv2d_batched
from ..layers import init_conv, relu


def conv2d(p, x, stride=1):
    """Single-image conv: dpt works per view inside a vmapped pair."""
    return _conv2d_batched(p, x[None], stride=stride)[0]

LAYER_DIMS = (96, 192, 384, 768)
FEATURE_DIM = 256


def init_conv_transpose(key, k, cin, cout):
    """Weight stored as (kh, kw, cout, cin) — exactly what the auto
    converter produces from torch's ConvTranspose2d (cin, cout, kh, kw)
    layout, so no special-casing at conversion time."""
    scale = 1.0 / (cin * k * k) ** 0.5
    kw_, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw_, (k, k, cout, cin), jnp.float32,
                                -scale, scale),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -scale, scale),
    }


def conv_transpose_s(p, x):
    """Non-overlapping ConvTranspose (kernel == stride) as einsum +
    depth-to-space. x: (H, W, Cin) → (H·k, W·k, Cout)."""
    kh, kw, cout, cin = p["w"].shape
    y = jnp.einsum("hwi,yxoi->hwyxo", x, p["w"],
                   preferred_element_type=jnp.float32)
    h, w = x.shape[:2]
    y = y.transpose(0, 2, 1, 3, 4).reshape(h * kh, w * kw, cout)
    return y + p["b"]


def _interp_matrix(n_in, n_out):
    """(n_out, n_in) bilinear interpolation matrix, torch
    align_corners=True grid: out_i samples at i·(n_in−1)/(n_out−1).
    Constant-folded by XLA (static shapes)."""
    pos = jnp.linspace(0.0, n_in - 1.0, n_out)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
    i1 = jnp.minimum(i0 + 1, n_in - 1)
    f = (pos - i0).astype(jnp.float32)
    rows = jnp.arange(n_out)
    return (jnp.zeros((n_out, n_in), jnp.float32)
            .at[rows, i0].add(1.0 - f)
            .at[rows, i1].add(f))


def resize_align_corners(x, out_hw):
    """Bilinear resize with torch align_corners=True semantics.
    x: (H, W, C).

    Separable-linear form: two MXU einsums against constant
    interpolation matrices instead of chained row/column gathers — the
    column gather lowers to strided HBM traffic on TPU and made the DPT
    pyramid's five upsamples a measurable slice of the DUSt3R step
    (r4 stage attribution, tools/profile_duster_stages.py)."""
    h, w = x.shape[:2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    # interpolation weights stay f32 regardless of the activation dtype
    # (advisor r4: bf16-rounding the constant matrices themselves loses
    # precision the old gather form kept); the mixed-dtype contraction
    # accumulates in f32 via preferred_element_type.
    ry = _interp_matrix(h, oh)
    rx = _interp_matrix(w, ow)
    y = jnp.einsum("Oh,hwc->Owc", ry, x,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.einsum("Pw,Owc->OPc", rx, y,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def _init_rcu(key, c):
    """ResidualConvUnit_custom (bn=False): two biased 3×3 convs,
    relu-first residual."""
    k1, k2 = jax.random.split(key)
    return {"conv1": init_conv(k1, 3, 3, c, c),
            "conv2": init_conv(k2, 3, 3, c, c)}


def _rcu_apply(p, x):
    y = conv2d(p["conv1"], relu(x))
    y = conv2d(p["conv2"], relu(y))
    return x + y


def _init_fusion(key, c):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"out_conv": init_conv(k1, 1, 1, c, c),
            "resConfUnit1": _init_rcu(k2, c),
            "resConfUnit2": _init_rcu(k3, c)}


def _fusion_apply(p, x, res=None, out_hw=None):
    """FeatureFusionBlock_custom: optional lateral add, RCU, 2× (or
    explicit-size) align-corners upsample, 1×1 out conv."""
    if res is not None:
        x = x + _rcu_apply(p["resConfUnit1"], res)
    x = _rcu_apply(p["resConfUnit2"], x)
    if out_hw is None:
        out_hw = (x.shape[0] * 2, x.shape[1] * 2)
    x = resize_align_corners(x, out_hw)
    return conv2d(p["out_conv"], x)


def init_dpt(rng, dim_tokens=(1024, 768, 768, 768), out_ch=4,
             layer_dims=LAYER_DIMS, feature_dim=FEATURE_DIM, last_dim=128):
    keys = jax.random.split(rng, 24)
    ki = iter(range(24))
    act = [
        {"0": init_conv(keys[next(ki)], 1, 1, dim_tokens[0], layer_dims[0]),
         "1": init_conv_transpose(keys[next(ki)], 4, layer_dims[0],
                                  layer_dims[0])},
        {"0": init_conv(keys[next(ki)], 1, 1, dim_tokens[1], layer_dims[1]),
         "1": init_conv_transpose(keys[next(ki)], 2, layer_dims[1],
                                  layer_dims[1])},
        {"0": init_conv(keys[next(ki)], 1, 1, dim_tokens[2], layer_dims[2])},
        {"0": init_conv(keys[next(ki)], 1, 1, dim_tokens[3], layer_dims[3]),
         # 3×3 stride-2 conv (an extra downsample for the deepest hook)
         "1": init_conv(keys[next(ki)], 3, 3, layer_dims[3], layer_dims[3])},
    ]
    scratch = {
        "refinenet1": _init_fusion(keys[next(ki)], feature_dim),
        "refinenet2": _init_fusion(keys[next(ki)], feature_dim),
        "refinenet3": _init_fusion(keys[next(ki)], feature_dim),
        "refinenet4": _init_fusion(keys[next(ki)], feature_dim),
    }
    for i, c in enumerate(layer_dims):
        scratch[f"layer{i + 1}_rn"] = init_conv(
            keys[next(ki)], 3, 3, c, feature_dim, bias=False)
    head = {
        "0": init_conv(keys[next(ki)], 3, 3, feature_dim, last_dim),
        "2": init_conv(keys[next(ki)], 3, 3, last_dim, 32),
        "4": init_conv(keys[next(ki)], 1, 1, 32, out_ch),
    }
    return {"act_postprocess": act, "scratch": scratch, "head": head}


def dpt_apply(p, hooks, grid):
    """hooks: 4 token arrays (N, D_k) at the DUSt3R hook depths;
    grid: (hp, wp). Returns a dense (hp·16, wp·16, out_ch) map."""
    hp, wp = grid
    fmaps = [h.reshape(hp, wp, h.shape[-1]) for h in hooks]

    act = p["act_postprocess"]
    l1 = conv_transpose_s(act[0]["1"], conv2d(act[0]["0"], fmaps[0]))
    l2 = conv_transpose_s(act[1]["1"], conv2d(act[1]["0"], fmaps[1]))
    l3 = conv2d(act[2]["0"], fmaps[2])
    l4 = conv2d(act[3]["1"], conv2d(act[3]["0"], fmaps[3]), stride=2)

    s = p["scratch"]
    l1 = conv2d(s["layer1_rn"], l1)
    l2 = conv2d(s["layer2_rn"], l2)
    l3 = conv2d(s["layer3_rn"], l3)
    l4 = conv2d(s["layer4_rn"], l4)

    path4 = _fusion_apply(s["refinenet4"], l4, out_hw=l3.shape[:2])
    path3 = _fusion_apply(s["refinenet3"], path4, l3, out_hw=l2.shape[:2])
    path2 = _fusion_apply(s["refinenet2"], path3, l2, out_hw=l1.shape[:2])
    path1 = _fusion_apply(s["refinenet1"], path2, l1)

    h = p["head"]
    x = conv2d(h["0"], path1)
    x = resize_align_corners(x, (x.shape[0] * 2, x.shape[1] * 2))
    x = relu(conv2d(h["2"], x))
    return conv2d(h["4"], x)
