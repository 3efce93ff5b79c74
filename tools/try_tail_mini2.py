import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W2, T = 8, 1024, 512, 16
FL = 2 * B * H * W2 * 9 * 128 * 128
print("init", flush=True)

def mk(kernel):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W2, 128), jnp.bfloat16),
        grid=(B, H // T),
        in_specs=[pl.BlockSpec((1, T, W2, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T, W2, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )

def k2d(x_ref, w_ref, o_ref):
    x = x_ref[0].reshape(T * W2, 128)
    s = None
    for t in range(9):
        p = jax.lax.dot_general(x, w_ref[t], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = p if s is None else s + p
    o_ref[0] = s.reshape(T, W2, 128).astype(jnp.bfloat16)

def k2d_concat(x_ref, w_ref, o_ref):
    x = x_ref[0].reshape(T * W2, 128)
    patch = jnp.concatenate([x] * 9, -1)
    wmat = w_ref[:].reshape(9 * 128, 128)
    p = jax.lax.dot_general(patch, wmat, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = p.reshape(T, W2, 128).astype(jnp.bfloat16)

w = jax.random.normal(jax.random.PRNGKey(1), (9, 128, 128), jnp.bfloat16)
print("w made", flush=True)

def bench(label, kernel):
    print("tracing", label, flush=True)
    pc = mk(kernel)
    def run(i):
        x = jax.random.uniform(jax.random.PRNGKey(i), (B, H, W2, 128),
                               jnp.float32).astype(jnp.bfloat16)
        return pc(x, w).astype(jnp.float32).sum()
    g = jax.jit(run)
    t0 = time.time()
    v = jax.block_until_ready(g(0))
    print("  compiled %.0fs" % (time.time() - t0), flush=True)
    t0 = time.time()
    jax.block_until_ready([g(1 + i) for i in range(20)])
    t = (time.time() - t0) / 20 * 1e3
    print(f"{label:12s}: {t:6.2f} ms -> {FL/t/1e9:6.1f} TF/s", flush=True)

bench("2d chain", k2d)
bench("2d concatK", k2d_concat)
