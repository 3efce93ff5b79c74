"""MXU rate vs N inside a pallas kernel: dot (8192,128)@(128,N)."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K = 8192, 128
GRID = 64

def bench(N, reps):
    FL = 2 * M * K * N * GRID * reps
    def k(x_ref, w_ref, o_ref):
        x = x_ref[0]
        s = None
        for r in range(reps):
            p = jax.lax.dot_general(x, w_ref[r], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = p if s is None else s + p
        o_ref[0] = s.astype(jnp.bfloat16)
    pc = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((GRID, M, N), jnp.bfloat16),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((1, M, K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, M, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    def run(i):
        x = jax.random.uniform(jax.random.PRNGKey(i), (GRID, M, K),
                               jnp.float32).astype(jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(i + 1), (reps, K, N),
                              jnp.bfloat16)
        return pc(x, w).astype(jnp.float32).sum()
    g = jax.jit(run)
    jax.block_until_ready(g(0))
    t0 = time.time()
    jax.block_until_ready([g(1 + i) for i in range(10)])
    t = (time.time() - t0) / 10 * 1e3
    print(f"N={N:5d} reps={reps}: {t:6.2f} ms -> {FL/t/1e9:6.1f} TF/s", flush=True)

bench(128, 9)
bench(512, 2)
bench(1152, 1)
bench(2048, 1)
