"""Micro-bench: XLA einsum MHA vs VMEM fused kernel at the ViT shapes.

DUSt3R e2e regressed with the fused kernel (34.4 -> 48.8 ms) while RoMa
improved (163 -> 154 ms); isolate where the kernel wins and gate
mha_auto accordingly.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imcui_tpu.ops import attention as att
from imcui_tpu.utils.benchmark import chain_bench

SHAPES = [
    ("duster-enc", 16, 1024, 64),
    ("duster-dec", 12, 1024, 64),
    ("dinov2-560", 16, 1664, 64),
    ("lightglue", 4, 1024, 64),
]


def qtiled_attention(q, k, v, blk_q=128):
    """fused_attention_small with q-tiling: logits per program are
    (blk_q, nk) instead of (nq, nk) — at 1664 tokens the single-shot
    kernel's 11 MB f32 logits squeeze the 16 MB scoped VMEM."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    h, nq, dh = q.shape
    nk = k.shape[1]
    maskf = jnp.ones((h, 1, nk), jnp.float32)
    kernel = functools.partial(att._flash_attn_kernel, blk_k=nk, n_k=1,
                               scale=1.0 / dh ** 0.5)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(h, nq // blk_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, dh), lambda hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda hh, i: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda hh, i: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda hh, i: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, dh), lambda hh, i: (hh, i, 0),
                               memory_space=pltpu.VMEM),
    )(q, k, v, maskf)


def main():
    for name, h, n, dh in SHAPES:
        for path in ("xla", "fused", "qtiled128", "qtiled256"):
            def step(_, key, acc, h=h, n=n, dh=dh, path=path):
                ks = jax.random.split(key, 3)
                q = jax.random.normal(ks[0], (h, n, dh), jnp.bfloat16)
                k = jax.random.normal(ks[1], (h, n, dh), jnp.bfloat16)
                v = jax.random.normal(ks[2], (h, n, dh), jnp.bfloat16)
                # 12 sequential applications approximate a block stack's
                # arithmetic intensity (kernel-launch amortisation)
                o = q
                for _ in range(12):
                    if path == "xla":
                        o = att.mha(o, k, v)
                    elif path == "fused":
                        o = att.fused_attention_small(o, k, v)
                    else:
                        o = qtiled_attention(o, k, v,
                                             blk_q=int(path[6:]))
                return acc + o.astype(jnp.float32).sum()

            dt, _ = chain_bench(step, None, iters=20, warmup=2)
            print(f"{name} [{path}]: {1000 * dt / 20 / 12:.3f} ms/attn",
                  flush=True)


if __name__ == "__main__":
    main()
