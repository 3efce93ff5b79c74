"""Vision Transformer building blocks (encoder + CroCo-style decoder).

Used by the pointmap matchers (DUSt3R/MASt3R — reference wrappers:
imcui/hloc/matchers/duster.py:23-109, mast3r.py:24-96; the networks live in
the dust3r submodule upstream and are rebuilt here from the published
CroCo/DUSt3R design: pre-LN ViT encoder shared across views, and a decoder
whose blocks add cross-attention to the other view's tokens).

All attention is masked-free (dense square token grids) and runs as MXU
einsums; bf16-friendly.
"""

import jax
import jax.numpy as jnp

from ..layers import (conv2d, gelu, init_conv, init_layer_norm, init_linear,
                      layer_norm, linear)

# Attention implementation for the 1024-token CroCo/DUSt3R blocks.
# "xla": einsum + fused softmax; "fused": single-shot VMEM kernel
# (ops.attention.mha_auto); "flash": jax.experimental library blockwise
# kernel. Measured r3/r4 on the real chip — see attention_apply's note.
ATTN_IMPL = "xla"


def _flash_lib(q, k, v, scale):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as _fa)
    return _fa(q[None], k[None], v[None], causal=False, sm_scale=scale)[0]


def init_mlp(key, dim, hidden):
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, dim, hidden),
            "fc2": init_linear(k2, hidden, dim)}


def mlp_apply(p, x):
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))


def init_attention(key, dim):
    """Fused-qkv self-attention (upstream croco ``Attention`` naming)."""
    k1, k2 = jax.random.split(key)
    return {"qkv": init_linear(k1, dim, 3 * dim),
            "proj": init_linear(k2, dim, dim)}


def init_cross_attention(key, dim):
    """Separate q/k/v projections (upstream croco ``CrossAttention``
    ships projq/projk/projv/proj — kept 1:1 so checkpoints convert
    without fusing)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {"projq": init_linear(k1, dim, dim),
            "projk": init_linear(k2, dim, dim),
            "projv": init_linear(k3, dim, dim),
            "proj": init_linear(k4, dim, dim)}


def _rope_1d(t, pos, base):
    """NeoX-style rotary embedding on one coordinate.
    t: (heads, n, d); pos: (n,) positions."""
    d = t.shape[-1]
    inv = 1.0 / (base ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    freqs = pos.astype(jnp.float32)[:, None] * inv[None]  # (n, d/2)
    emb = jnp.concatenate([freqs, freqs], -1)  # (n, d)
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    t1, t2 = jnp.split(t, 2, axis=-1)
    rotated = jnp.concatenate([-t2, t1], -1)
    return t * cos[None] + rotated * sin[None]


def rope_2d(t, pos, base=100.0):
    """croco RoPE2D (freq base 100): the head dim is halved into a
    y-half and an x-half, each rotated 1-D by its grid coordinate.
    t: (heads, n, d); pos: (n, 2) integer (y, x) patch coordinates."""
    ty, tx = jnp.split(t, 2, axis=-1)
    return jnp.concatenate([
        _rope_1d(ty, pos[:, 0], base), _rope_1d(tx, pos[:, 1], base)
    ], -1)


def attention_apply(p, x, num_heads, context=None, pos=None, kpos=None,
                    rope_base=None):
    """Self-attention when context is None, else cross-attention
    (q from x, k/v from context). With ``rope_base`` set, q/k are
    rotary-embedded at patch positions ``pos`` (and ``kpos`` for the
    context side) — the DUSt3R/CroCo-v2 scheme."""
    n, d = x.shape
    dh = d // num_heads
    if context is None:
        qkv = linear(p["qkv"], x).reshape(n, 3, num_heads, dh)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        kpos = pos
    else:
        m = context.shape[0]
        q = linear(p["projq"], x).reshape(n, num_heads, dh)
        k = linear(p["projk"], context).reshape(m, num_heads, dh)
        v = linear(p["projv"], context).reshape(m, num_heads, dh)
    q = q.transpose(1, 0, 2)
    k = k.transpose(1, 0, 2)
    v = v.transpose(1, 0, 2)
    if rope_base is not None and pos is not None:
        q = rope_2d(q, pos, rope_base)
        k = rope_2d(k, kpos if kpos is not None else pos, rope_base)
    # Measured r4 (tools/try_duster_attn.py, full DUSt3R programs):
    # xla 34.9 / fused 34.7 / flash 34.5 ms/pair — all within tunnel
    # noise at 1024 tokens (r3's 48.8 ms fused regression did not
    # reproduce). The encoder is matmul-issue-bound at these widths,
    # not logits-traffic-bound, so keep the dependency-free XLA einsum;
    # the fused path pays off only at DINOv2's 1664-token grids
    # (backbones/dinov2.py, 163→154 ms/pair e2e). ATTN_IMPL switches the
    # path for whole-program A/Bs.
    if ATTN_IMPL != "xla" and q.dtype == jnp.bfloat16:
        from ...ops import attention as att_ops
        if ATTN_IMPL == "flash":
            out = _flash_lib(q, k, v, 1.0 / dh**0.5)
        else:
            out = att_ops.mha_auto(q, k, v)
        return linear(p["proj"], out.transpose(1, 0, 2).reshape(n, d))
    logits = jnp.einsum("hnd,hmd->hnm", q, k,
                        preferred_element_type=jnp.float32) / dh**0.5
    attn = jax.nn.softmax(logits, -1)
    out = jnp.einsum("hnm,hmd->hnd", attn.astype(x.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return linear(p["proj"], out.transpose(1, 0, 2).reshape(n, d))


def init_encoder_block(key, dim, mlp_ratio=4):
    k1, k2 = jax.random.split(key)
    return {
        "norm1": init_layer_norm(dim),
        "attn": init_attention(k1, dim),
        "norm2": init_layer_norm(dim),
        "mlp": init_mlp(k2, dim, dim * mlp_ratio),
    }


def encoder_block_apply(p, x, num_heads, pos=None, rope_base=None):
    x = x + attention_apply(p["attn"], layer_norm(p["norm1"], x), num_heads,
                            pos=pos, rope_base=rope_base)
    x = x + mlp_apply(p["mlp"], layer_norm(p["norm2"], x))
    return x


def init_decoder_block(key, dim, mlp_ratio=4):
    """CroCo decoder block: self-attn + cross-attn + MLP."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "norm1": init_layer_norm(dim),
        "attn": init_attention(k1, dim),
        "norm2": init_layer_norm(dim),
        "cross_attn": init_cross_attention(k2, dim),
        "norm3": init_layer_norm(dim),
        "mlp": init_mlp(k3, dim, dim * mlp_ratio),
        "norm_y": init_layer_norm(dim),
    }


def decoder_block_apply(p, x, y, num_heads, pos=None, kpos=None,
                        rope_base=None):
    """x attends to itself, then to the other view's tokens y."""
    x = x + attention_apply(p["attn"], layer_norm(p["norm1"], x), num_heads,
                            pos=pos, rope_base=rope_base)
    x = x + attention_apply(
        p["cross_attn"], layer_norm(p["norm2"], x), num_heads,
        context=layer_norm(p["norm_y"], y),
        pos=pos, kpos=kpos, rope_base=rope_base,
    )
    x = x + mlp_apply(p["mlp"], layer_norm(p["norm3"], x))
    return x


def init_patch_embed(key, patch, cin, dim):
    return {"proj": init_conv(key, patch, patch, cin, dim)}


def patch_embed_apply(p, image, patch):
    """image: (H, W, C) → tokens (H/p · W/p, dim)."""
    x = conv2d(p["proj"], image[None], stride=patch, padding="VALID")[0]
    hp, wp, d = x.shape
    return x.reshape(hp * wp, d), (hp, wp)


def grid_positions(hp, wp):
    """(hp·wp, 2) integer (y, x) patch coordinates, row-major — the
    croco PositionGetter order (cartesian_prod of rows then cols)."""
    ys = jnp.arange(hp, dtype=jnp.int32)
    xs = jnp.arange(wp, dtype=jnp.int32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gy.reshape(-1), gx.reshape(-1)], -1)


def sincos_pos_embed(hp, wp, dim):
    """2-D sin-cos position embedding (DUSt3R uses RoPE in some variants;
    the CroCo v2 default is 2-D sincos)."""
    def embed_1d(n, d):
        pos = jnp.arange(n, dtype=jnp.float32)[:, None]
        omega = jnp.arange(d // 2, dtype=jnp.float32) / (d // 2)
        omega = 1.0 / (10000.0 ** omega)
        out = pos * omega[None]
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], -1)

    ey = embed_1d(hp, dim // 2)  # (hp, dim/2)
    ex = embed_1d(wp, dim // 2)
    full = jnp.concatenate(
        [
            jnp.repeat(ey[:, None, :], wp, 1),
            jnp.repeat(ex[None, :, :], hp, 0),
        ],
        -1,
    )
    return full.reshape(hp * wp, dim)
