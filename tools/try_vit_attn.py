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


def main():
    for name, h, n, dh in SHAPES:
        for path in ("xla", "fused"):
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
                    else:
                        o = att.fused_attention_small(o, k, v)
                return acc + o.astype(jnp.float32).sum()

            dt, _ = chain_bench(step, None, iters=20, warmup=2)
            print(f"{name} [{path}]: {1000 * dt / 20 / 12:.3f} ms/attn",
                  flush=True)


if __name__ == "__main__":
    main()
