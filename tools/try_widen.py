"""Trusted-harness test: 9 chained K=128 dots vs one (M,128)@(128,1152)
wide dot + lane-sliced tap reduction. Same FLOPs, same IO."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W2, T = 8, 1024, 512, 16
FL = 2 * B * H * W2 * 9 * 128 * 128

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

def k_chain(x_ref, w_ref, o_ref):
    x = x_ref[0].reshape(T * W2, 128)
    w = w_ref[:].reshape(9, 128, 128)
    s = None
    for t in range(9):
        p = jax.lax.dot_general(x, w[t], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = p if s is None else s + p
    o_ref[0] = s.reshape(T, W2, 128).astype(jnp.bfloat16)

def k_wide(x_ref, w_ref, o_ref):
    MC = 2048
    w = w_ref[:].reshape(128, 1152)
    for c0 in range(0, T * W2, MC):
        x = x_ref[0].reshape(T * W2, 128)[c0:c0 + MC]
        p = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = None
        for t in range(9):
            q = p[:, t * 128:(t + 1) * 128]
            s = q if s is None else s + q
        o_ref[0].reshape(T * W2, 128)[c0:c0 + MC] = s.astype(jnp.bfloat16)

def bench(label, kernel, wshape):
    pc = mk(kernel)
    def run(i):
        x = jax.random.uniform(jax.random.PRNGKey(i), (B, H, W2, 128),
                               jnp.float32).astype(jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(i + 1), wshape,
                              jnp.bfloat16)
        return pc(x, w).astype(jnp.float32).sum()
    g = jax.jit(run)
    jax.block_until_ready(g(0))
    t0 = time.time()
    jax.block_until_ready([g(1 + i) for i in range(20)])
    t = (time.time() - t0) / 20 * 1e3
    print(f"{label:14s}: {t:6.2f} ms -> {FL/t/1e9:6.1f} TF/s", flush=True)

bench("chain 9xN128", k_chain, (9, 128, 128))
bench("wide N1152", k_wide, (128, 1152))
