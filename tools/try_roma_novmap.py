"""Confirm the vmap(B=1) penalty on RoMa: full match+sample WITHOUT the
vmap wrapper vs the production _apply_batched path.

r4 evidence: the stage-ablation programs (no vmap) total ~77 ms while
the bench (vmap over B=1) reads ~98 ms with the same math.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imcui_tpu.utils.benchmark import chain_bench

R = 560


def main():
    from imcui_tpu.models.matchers import roma

    conf = {"dinov2_variant": "vitl14"}
    params = roma.init_params(jax.random.PRNGKey(0), conf)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    def step_novmap(params, key, acc):
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (R, R, 3), jnp.bfloat16)
        i1 = jax.random.uniform(k1, (R, R, 3), jnp.bfloat16)
        warp, cert = roma.match(params, i0, i1, conf)
        k0p, k1p, score, valid = roma.sample(warp, cert, R, R, num=2048)
        return acc + score.astype(jnp.float32).sum()

    def step_vmap(params, key, acc):
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (1, R, R, 3), jnp.bfloat16)
        i1 = jax.random.uniform(k1, (1, R, R, 3), jnp.bfloat16)
        out = roma._apply_batched(params, i0, i1, 2048,
                                  (("dinov2_variant", "vitl14"),))
        return acc + out["scores"].astype(jnp.float32).sum()

    for name, fn in (("novmap", step_novmap), ("vmap_b1", step_vmap)):
        dt, _ = chain_bench(fn, params, iters=15, warmup=2,
                            key_base=hash(name) % 1000)
        print(json.dumps({"variant": name,
                          "ms_per_pair": round(1000 * dt / 15, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
