"""Minimal repro: does a blocked pallas matmul kernel compile/run here?"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W2, T = 8, 1024, 512, 16

def k(x_ref, w_ref, o_ref):
    x = x_ref[0]
    s = None
    for t in range(9):
        p = jax.lax.dot_general(x, w_ref[t], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = p if s is None else s + p
    o_ref[0] = s.astype(jnp.bfloat16)

x = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W2, 128),
                       jnp.float32).astype(jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(1), (9, 128, 128), jnp.bfloat16)
f = pl.pallas_call(
    k,
    out_shape=jax.ShapeDtypeStruct((B, H, W2, 128), jnp.bfloat16),
    grid=(B, H // T),
    in_specs=[pl.BlockSpec((1, T, W2, 128), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, T, W2, 128), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM),
)
t0 = time.time()
out = jax.block_until_ready(jax.jit(f)(x, w))
print("ok", out.shape, "compile+run %.1fs" % (time.time() - t0), flush=True)

# now: gen-inside-jit + sum, timed like the variants harness
def gen(i):
    return jax.random.uniform(jax.random.PRNGKey(i), (B, H, W2, 128),
                              jnp.float32).astype(jnp.bfloat16)
g = jax.jit(lambda i: f(gen(i), w).astype(jnp.float32).sum())
t0 = time.time()
print("first:", g(0), "%.1fs" % (time.time() - t0), flush=True)
t0 = time.time()
jax.block_until_ready([g(1 + i) for i in range(20)])
print("per-iter %.2f ms" % ((time.time() - t0) / 20 * 1e3), flush=True)
