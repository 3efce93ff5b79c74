"""DINOv2 Vision Transformer (ViT-L/14 and friends), native JAX.

RoMa couples a frozen DINOv2 ViT-L/14 encoder with a GP-based coarse
matcher (reference wrapper: imcui/hloc/matchers/roma.py:17-94, which
loads ``dinov2_vitl14_pretrain.pth`` next to the RoMa checkpoint).
This is the published DINOv2 architecture (facebookresearch/dinov2):
14×14 patch embed, cls token + learned position embedding (bicubically
interpolated to the input grid), pre-LN blocks with LayerScale on both
residual branches, GELU MLP, final LayerNorm. RoMa consumes
``x_norm_patchtokens`` — the normed patch tokens without cls.

TPU notes: attention runs as dense MXU einsums over the (Hp·Wp) token
grid (1600 tokens at RoMa's 560² coarse resolution); everything is
jit-compatible with static shapes per resolution bucket. Sharding rules
for multi-chip inference live in parallel/mesh.py (column/row-parallel
qkv/proj like the LightGlue rules, plus sequence sharding over tokens).

Weight conversion: upstream state_dict keys (cls_token, pos_embed,
patch_embed.proj, blocks.N.{norm1,attn.qkv,attn.proj,ls1.gamma,norm2,
mlp.fc1,mlp.fc2,ls2.gamma}, norm) map 1:1 onto this tree —
``convert_state_dict`` below.
"""

import jax
import jax.numpy as jnp

from ...ops.attention import mha_auto
from ..layers import (conv2d, gelu, init_conv, init_layer_norm, init_linear,
                      layer_norm, linear)

CONFIGS = {
    "vitl14": {"dim": 1024, "depth": 24, "num_heads": 16, "mlp_ratio": 4,
               "patch": 14, "pretrain_grid": 37},  # 518/14 = 37
    "vitb14": {"dim": 768, "depth": 12, "num_heads": 12, "mlp_ratio": 4,
               "patch": 14, "pretrain_grid": 37},
    # tiny config for tests
    "test": {"dim": 64, "depth": 2, "num_heads": 4, "mlp_ratio": 4,
             "patch": 14, "pretrain_grid": 37},
}

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def init_block(key, dim, mlp_ratio):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "norm1": init_layer_norm(dim),
        "attn": {"qkv": init_linear(k1, dim, 3 * dim),
                 "proj": init_linear(k2, dim, dim)},
        "ls1": {"gamma": jnp.full((dim,), 1e-5, jnp.float32)},
        "norm2": init_layer_norm(dim),
        "mlp": {"fc1": init_linear(k3, dim, dim * mlp_ratio),
                "fc2": init_linear(jax.random.fold_in(k3, 1),
                                   dim * mlp_ratio, dim)},
        "ls2": {"gamma": jnp.full((dim,), 1e-5, jnp.float32)},
    }


def init_params(rng, cfg):
    c = CONFIGS[cfg] if isinstance(cfg, str) else cfg
    dim = c["dim"]
    g = c["pretrain_grid"]
    keys = jax.random.split(rng, c["depth"] + 2)
    return {
        "patch_embed": {"proj": init_conv(keys[0], c["patch"], c["patch"],
                                          3, dim)},
        "cls_token": jnp.zeros((1, dim), jnp.float32),
        "pos_embed": jax.random.normal(keys[1], (1 + g * g, dim)) * 0.02,
        "blocks": [init_block(keys[2 + i], dim, c["mlp_ratio"])
                   for i in range(c["depth"])],
        "norm": init_layer_norm(dim),
    }


def _interp_pos_embed(pos_embed, hp, wp):
    """Bicubic-resample the pretraining position grid to (hp, wp)
    (upstream interpolate_pos_encoding)."""
    cls_pe, patch_pe = pos_embed[:1], pos_embed[1:]
    g = int(round(float(patch_pe.shape[0]) ** 0.5))
    if (hp, wp) != (g, g):
        grid = patch_pe.reshape(g, g, -1)
        grid = jax.image.resize(grid, (hp, wp, grid.shape[-1]), "bicubic")
        patch_pe = grid.reshape(hp * wp, -1)
    return jnp.concatenate([cls_pe, patch_pe], 0)


def _attn(p, x, num_heads):
    n, d = x.shape
    dh = d // num_heads
    qkv = linear(p["qkv"], x).reshape(n, 3, num_heads, dh)
    q, k, v = (qkv[:, i].transpose(1, 0, 2) for i in range(3))
    # fused VMEM attention on TPU, XLA einsum fallback elsewhere; the
    # 1601-token 560²/14 grid pads to 1664 inside mha_auto
    out = mha_auto(q, k, v).astype(x.dtype)
    return linear(p["proj"], out.transpose(1, 0, 2).reshape(n, d))


def block_apply(p, x, num_heads):
    x = x + p["ls1"]["gamma"] * _attn(p["attn"],
                                      layer_norm(p["norm1"], x), num_heads)
    x = x + p["ls2"]["gamma"] * mlp(p["mlp"], layer_norm(p["norm2"], x))
    return x


def mlp(p, x):
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))


def apply(params, image, cfg, normalize=True):
    """image: (H, W, 3) in [0,1], H/W divisible by the patch size.
    Returns normed patch tokens (Hp·Wp, dim) and (Hp, Wp)."""
    c = CONFIGS[cfg] if isinstance(cfg, str) else cfg
    if normalize:
        image = (image - IMAGENET_MEAN) / IMAGENET_STD
    x = conv2d(params["patch_embed"]["proj"], image[None],
               stride=c["patch"], padding="VALID")[0]
    hp, wp, dim = x.shape
    tokens = x.reshape(hp * wp, dim)
    tokens = jnp.concatenate([params["cls_token"], tokens], 0)
    tokens = tokens + _interp_pos_embed(params["pos_embed"], hp, wp)
    # blocks run as a lax.scan over stacked params: identical math to the
    # Python loop, but the compiled HLO holds ONE block body instead of
    # `depth` copies — at ViT-L scale the unrolled graph was large enough
    # to break the remote-compile transport (and costs minutes of XLA
    # time even when it succeeds)
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *params["blocks"])

    def body(tok, blk):
        return block_apply(blk, tok, c["num_heads"]), None

    tokens, _ = jax.lax.scan(body, tokens, stacked)
    tokens = layer_norm(params["norm"], tokens)
    return tokens[1:], (hp, wp)  # x_norm_patchtokens


def convert_state_dict(sd, depth):
    """Upstream dinov2 state_dict → param tree (numpy in, jnp out).
    Linear weights transpose (torch (out,in) → (in,out)); the patch-embed
    conv transposes OIHW → HWIO."""
    import numpy as np

    def lin(prefix):
        out = {"w": jnp.asarray(np.asarray(sd[prefix + ".weight"]).T)}
        if prefix + ".bias" in sd:
            out["b"] = jnp.asarray(np.asarray(sd[prefix + ".bias"]))
        return out

    def ln(prefix):
        return {"scale": jnp.asarray(np.asarray(sd[prefix + ".weight"])),
                "bias": jnp.asarray(np.asarray(sd[prefix + ".bias"]))}

    params = {
        "patch_embed": {"proj": {
            "w": jnp.asarray(np.asarray(
                sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0)),
            "b": jnp.asarray(np.asarray(sd["patch_embed.proj.bias"])),
        }},
        "cls_token": jnp.asarray(np.asarray(sd["cls_token"])).reshape(1, -1),
        "pos_embed": jnp.asarray(np.asarray(sd["pos_embed"]))[0],
        "blocks": [],
        "norm": ln("norm"),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        params["blocks"].append({
            "norm1": ln(f"{b}.norm1"),
            "attn": {"qkv": lin(f"{b}.attn.qkv"),
                     "proj": lin(f"{b}.attn.proj")},
            "ls1": {"gamma": jnp.asarray(np.asarray(sd[f"{b}.ls1.gamma"]))},
            "norm2": ln(f"{b}.norm2"),
            "mlp": {"fc1": lin(f"{b}.mlp.fc1"),
                    "fc2": lin(f"{b}.mlp.fc2")},
            "ls2": {"gamma": jnp.asarray(np.asarray(sd[f"{b}.ls2.gamma"]))},
        })
    return params
