"""MXU rate: bf16 vs int8 matmul, XLA level."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

M, K, N = 8192, 2048, 2048
ITERS = 30
FL = 2 * M * K * N

def timed(f):
    jax.block_until_ready(f(0))
    t0 = time.perf_counter()
    jax.block_until_ready([f(1 + i) for i in range(ITERS)])
    return (time.perf_counter() - t0) / ITERS * 1e3

def gen(i, dtype):
    a = jax.random.normal(jax.random.PRNGKey(i), (M, K))
    b = jax.random.normal(jax.random.PRNGKey(i + 1), (K, N))
    if dtype == jnp.int8:
        return (a * 10).astype(jnp.int8), (b * 10).astype(jnp.int8)
    return a.astype(dtype), b.astype(dtype)

for name, dt, acc in (("bf16", jnp.bfloat16, jnp.float32),
                      ("int8", jnp.int8, jnp.int32)):
    f = jax.jit(lambda i, dt=dt, acc=acc: jax.lax.dot_general(
        *gen(i, dt), (((1,), (0,)), ((), ())),
        preferred_element_type=acc).sum())
    t = timed(f)
    print(f"{name}: {t:6.2f} ms -> {FL/t/1e9:6.1f} TFLOP/s", flush=True)
