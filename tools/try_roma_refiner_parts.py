"""Split RoMa's fine-refiner cost: conv stack vs input assembly.

The r4 stage attribution (profile_roma_stages.py) put the per-scale
refiner increments at r8 10.8 / r4 8.3 / r2 7.3 / r1 11.2 ms. Each
increment bundles: per-scale proj conv, warp/cert resize, bilinear
feature warp, (corr at r8/r4), and the 6-9-layer conv stack. This tool
re-measures the FULL match program with the hidden-block count of ONE
scale dropped to 1 — the difference isolates the conv stack's share,
deciding whether folding/pallas work should target the convs or the
gathers.

Usage: python tools/try_roma_refiner_parts.py [base s1 s2 s4 s8]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imcui_tpu.utils.benchmark import chain_bench

R = 560


def main(variants):
    from imcui_tpu.models.matchers import roma

    orig_blocks = {s: cfg["blocks"] for s, cfg in roma.REFINERS.items()}

    for variant in variants:
        for s, cfg in roma.REFINERS.items():
            cfg["blocks"] = (1 if variant == f"s{s}" else orig_blocks[s])
        conf = {"dinov2_variant": "vitl14"}
        params = roma.init_params(jax.random.PRNGKey(0), conf)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)

        def step(params, key, acc):
            k0, k1 = jax.random.split(key)
            i0 = jax.random.uniform(k0, (R, R, 3), jnp.bfloat16)
            i1 = jax.random.uniform(k1, (R, R, 3), jnp.bfloat16)
            warp, cert = roma.match_gp(params, i0, i1, conf)
            return (acc + warp.astype(jnp.float32).sum()
                    + cert.astype(jnp.float32).sum())

        dt, _ = chain_bench(step, params, iters=15, warmup=2,
                            key_base=hash(variant) % 1000)
        print(json.dumps({"variant": variant,
                          "ms": round(1000 * dt / 15, 2)}), flush=True)

    for s, cfg in roma.REFINERS.items():
        cfg["blocks"] = orig_blocks[s]


if __name__ == "__main__":
    main(sys.argv[1:] or ["base", "s1", "s2", "s4", "s8"])
