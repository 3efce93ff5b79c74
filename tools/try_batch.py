"""Throughput vs batch size for the fused step."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from imcui_tpu.pipeline import two_view

H = W = 1024
N, L = 1024, 9
ITERS = 40
params = two_view.init_params(n_layers=L)

import os
for B in (int(os.environ.get("TRYB", "8")),):
    valid = jnp.tile(jnp.asarray([[W, H]], jnp.int32), (B, 1))
    @jax.jit
    def step(i):
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(i), 3)
        image0 = jax.random.uniform(k0, (B, 1, H, W), jnp.float32)
        image1 = jax.random.uniform(k1, (B, 1, H, W), jnp.float32)
        out = two_view.match_step(params, image0, image1, valid, valid, k2,
                                  max_keypoints=N, n_layers=L,
                                  num_hypotheses=512, ransac="fundamental")
        return out["matching_scores0"].sum() + out["num_inliers"].sum()
    jax.block_until_ready(step(0))
    t0 = time.perf_counter()
    jax.block_until_ready([step(1 + i) for i in range(ITERS)])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"B={B:2d}: {dt*1e3:7.2f} ms/step -> {B/dt:7.1f} pairs/s", flush=True)
