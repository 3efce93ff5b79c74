"""int8 vs bf16 9-tap chained dots at the stage-tail shape, trusted
harness (mini kernel measured 21.5 ms in bf16)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W2, T = 8, 1024, 512, 16
FL = 2 * B * H * W2 * 9 * 128 * 128

def bench(label, dtype, acc):
    def k(x_ref, w_ref, o_ref):
        x = x_ref[0].reshape(T * W2, 128)
        s = None
        for t in range(9):
            p = jax.lax.dot_general(x, w_ref[t], (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc)
            s = p if s is None else s + p
        o_ref[0] = s.reshape(T, W2, 128).astype(jnp.bfloat16)
    pc = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((B, H, W2, 128), jnp.bfloat16),
        grid=(B, H // T),
        in_specs=[pl.BlockSpec((1, T, W2, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T, W2, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    w = (jax.random.normal(jax.random.PRNGKey(1), (9, 128, 128)) * 20
         ).astype(dtype)
    def run(i):
        x = (jax.random.uniform(jax.random.PRNGKey(i), (B, H, W2, 128))
             * 50).astype(dtype)
        return pc(x, w).astype(jnp.float32).sum()
    g = jax.jit(run)
    jax.block_until_ready(g(0))
    t0 = time.time()
    jax.block_until_ready([g(1 + i) for i in range(20)])
    t = (time.time() - t0) / 20 * 1e3
    print(f"{label}: {t:6.2f} ms -> {FL/t/1e9:6.1f} T/s", flush=True)

bench("bf16", jnp.bfloat16, jnp.float32)
bench("int8", jnp.int8, jnp.int32)
