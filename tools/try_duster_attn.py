"""Whole-program A/B: DUSt3R forward with xla / fused / flash attention.

r3 measured the VMEM fused kernel losing e2e at 1024 tokens (34.4 →
48.8 ms/pair); the r4 stage attribution (profile_duster_stages.py:
enc 17.2, +dec 8.2, +dpt 7.4 ms) says the encoder is attention-HBM-
bound, so re-test with (a) the fused kernel and (b) the library
blockwise flash kernel, as full programs.

Usage: python tools/try_duster_attn.py [xla fused flash]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imcui_tpu.utils.benchmark import chain_bench

R = 512


def main(impls):
    from imcui_tpu.models.backbones import vit
    from imcui_tpu.models.matchers import duster

    conf = dict(duster.PUBLISHED, max_matches=2048, subsample=8)
    params = duster.init_params(jax.random.PRNGKey(0), conf)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    for impl in impls:
        vit.ATTN_IMPL = impl

        def step(params, key, acc):
            k0, k1 = jax.random.split(key)
            i0 = jax.random.uniform(k0, (R, R, 3), jnp.bfloat16) * 2 - 1
            i1 = jax.random.uniform(k1, (R, R, 3), jnp.bfloat16) * 2 - 1
            out = duster.forward_pair(params, i0, i1, conf)
            return acc + out["scores"].astype(jnp.float32).sum()

        dt, _ = chain_bench(step, params, iters=20, warmup=2,
                            key_base=hash(impl) % 1000)
        print(json.dumps({"impl": impl, "ms_per_pair":
                          round(1000 * dt / 20, 2)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["xla", "fused", "flash"])
