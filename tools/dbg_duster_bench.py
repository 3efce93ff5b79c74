"""Diagnose the impossible DUSt3R bench number (485 pairs/s = 2.06 ms
for a ViT-L pair forward ~4x over chip peak).

Checks, in one compile:
  1. compiled cost_analysis FLOPs -- is the full graph even there?
  2. timing at iters=20 vs iters=80 -- does wall time scale with iters?
  3. value fetch (np.asarray) after the block -- does the scalar change
     per iteration (distinct keys) and is it finite?
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from imcui_tpu.models.matchers import duster


def main():
    B, R = 1, 512
    conf = dict(duster.PUBLISHED, max_matches=2048, subsample=8)
    params = duster.init_params(jax.random.PRNGKey(0), conf)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    conf_key = tuple(sorted(
        {k: conf[k] for k in
         ("enc_dim", "enc_depth", "enc_heads", "dec_dim", "dec_depth",
          "dec_heads", "patch", "max_matches", "subsample",
          "pos_embed", "head_type")}.items()))

    @jax.jit
    def step(params, key):
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (B, R, R, 3), jnp.bfloat16) * 2 - 1
        i1 = jax.random.uniform(k1, (B, R, R, 3), jnp.bfloat16) * 2 - 1
        out = duster._apply_batched(params, i0, i1, conf_key)
        return out["scores"].astype(jnp.float32).sum()

    t0 = time.perf_counter()
    lowered = step.lower(params, jax.random.PRNGKey(0))
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter() - t0:.1f}s", flush=True)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"cost_analysis flops: {ca.get('flops', float('nan')):.3e}",
          flush=True)
    print(f"bytes accessed: {ca.get('bytes accessed', float('nan')):.3e}",
          flush=True)

    for i in range(3):
        jax.block_until_ready(step(params, jax.random.PRNGKey(10_000 + i)))

    for iters in (20, 80):
        t0 = time.perf_counter()
        accs = [step(params, jax.random.PRNGKey(i)) for i in range(iters)]
        jax.block_until_ready(accs)
        dt = time.perf_counter() - t0
        print(f"iters={iters}: {dt:.3f}s total, "
              f"{1000 * dt / iters:.2f} ms/iter", flush=True)

    vals = [float(np.asarray(a)) for a in accs[:5]]
    print("first 5 values:", vals, flush=True)

    # forced full fetch per iteration (slow path, but unambiguous)
    t0 = time.perf_counter()
    for i in range(10):
        float(np.asarray(step(params, jax.random.PRNGKey(500 + i))))
    dt = time.perf_counter() - t0
    print(f"sync-fetch: {100 * dt:.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
