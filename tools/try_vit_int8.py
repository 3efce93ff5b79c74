"""W8A8 int8 vs bf16 at ViT-L block shapes (DINOv2's 1664-token grid).

Raw MXU rate measured int8 at ~2.7x bf16 at wide N (tools/try_int8.py);
this probe asks whether that survives a FULL 24-block encoder forward —
layernorms, attention einsums (kept bf16), residuals, and the dynamic
per-row activation quantisation around every projection matmul.

Usage: python tools/try_vit_int8.py [n_tokens] (default 1664)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imcui_tpu.models.backbones import vit
from imcui_tpu.models.layers import quantize_linear_int8
from imcui_tpu.utils.benchmark import chain_bench

DIM, HEADS, DEPTH = 1024, 16, 24
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1664


def make_params(key):
    keys = jax.random.split(key, DEPTH)
    return [vit.init_encoder_block(k, DIM) for k in keys]


def cast_bf16(tree):
    return jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), tree)


def quantize_blocks(blocks):
    out = []
    for b in blocks:
        out.append({
            "norm1": cast_bf16(b["norm1"]),
            "attn": {"qkv": quantize_linear_int8(b["attn"]["qkv"]),
                     "proj": quantize_linear_int8(b["attn"]["proj"])},
            "norm2": cast_bf16(b["norm2"]),
            "mlp": {"fc1": quantize_linear_int8(b["mlp"]["fc1"]),
                    "fc2": quantize_linear_int8(b["mlp"]["fc2"])},
        })
    return out


def forward(blocks, x):
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)

    def body(h, blk):
        return vit.encoder_block_apply(blk, h, HEADS), None

    x, _ = jax.lax.scan(body, x, stacked)
    return x


def bench(label, blocks):
    def step(params, key, acc):
        x = jax.random.normal(key, (N, DIM), jnp.bfloat16)
        return acc + forward(params, x).astype(jnp.float32).sum()

    dt, _ = chain_bench(step, blocks, 20, 3)
    ms = 1000 * dt / 20
    # projection matmul FLOPs only (attn logits excluded, same both paths)
    tf = 24e-12 * N * DIM * DIM * DEPTH / (dt / 20)
    print(f"{label:10s} {ms:8.2f} ms/fwd   proj-matmul eff {tf:6.1f} TF/s",
          flush=True)
    return ms


if __name__ == "__main__":
    params = make_params(jax.random.PRNGKey(0))
    bf = bench("bf16", cast_bf16(params))
    q = bench("int8", quantize_blocks(params))
    print(f"speedup {bf / q:.2f}x", flush=True)
    # numerical drift of the full 24-block forward, same weights
    x = jax.random.normal(jax.random.PRNGKey(1), (N, DIM), jnp.float32)
    ref = forward(params, x)
    got = forward(quantize_blocks(params), x.astype(jnp.bfloat16))
    ref_b = forward(cast_bf16(params), x.astype(jnp.bfloat16))
    import numpy as np
    r = np.asarray(ref, np.float64).ravel()
    g = np.asarray(got.astype(jnp.float32), np.float64).ravel()
    b = np.asarray(ref_b.astype(jnp.float32), np.float64).ravel()
    cos = r @ g / (np.linalg.norm(r) * np.linalg.norm(g))
    cos_b = r @ b / (np.linalg.norm(r) * np.linalg.norm(b))
    print(f"cosine(f32, int8) {cos:.6f}   cosine(f32, bf16) {cos_b:.6f}",
          flush=True)
