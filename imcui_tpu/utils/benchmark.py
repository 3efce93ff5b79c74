"""Trustworthy wall-clock measurement for the axon TPU tunnel.

Round-2's rule ("reduce outputs to scalars, submit all iterations,
block once at the end") turned out to be insufficient: for some
compiled programs (first seen on the scan-ified DUSt3R ViT-L forward)
``jax.block_until_ready`` returns without waiting — 80 iterations of a
~60 ms program "completed" in 0.11 s and the timed value was fantasy
(BASELINE_heavy round-3 note). Value *fetches* are the only blocking
primitive this transport honors.

The pattern here is immune to that: every iteration takes the previous
iteration's scalar accumulator as an INPUT and returns a new one, so
iteration N cannot run before N-1 has produced its value, and the
single host fetch of the final accumulator cannot complete before every
step has executed. Dispatch overhead (~1 ms/call host-side) overlaps
with device compute for any step over a few ms.

Usage:
    def step(params, key, acc):        # jitted by chain_bench
        ... compute ...
        return acc + result_scalar
    dt = chain_bench(step, params, iters=40)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["chain_bench"]


def chain_bench(step, params, iters, warmup=3, key_base=0):
    """Time ``iters`` chained executions of ``step(params, key, acc)``.

    ``step`` must fold its result into ``acc`` (a float32 scalar) and
    return the new accumulator. Returns (seconds_total, final_value);
    the value is fetched to host, which is the synchronization point.
    """
    step = jax.jit(step)
    acc = jnp.float32(0.0)
    for i in range(warmup):
        acc = step(params, jax.random.PRNGKey(10_000 + key_base + i), acc)
    float(np.asarray(acc))  # sync: warmup + compile fully drained

    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for i in range(iters):
        acc = step(params, jax.random.PRNGKey(key_base + i), acc)
    val = float(np.asarray(acc))
    dt = time.perf_counter() - t0
    return dt, val
