"""Stage-tail conv formulations: 9xK=128 chained dots vs 3xK=384 vs
1xK=1152 (im2col in VMEM via tile-aligned lane concat). Perf only --
shift edge semantics ignored."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W2 = 8, 1024, 512
T = 16
ITERS = 20
FL = 2 * B * H * W2 * 9 * 128 * 128  # 618 GFLOP

def timed(f):
    jax.block_until_ready(f(0))
    t0 = time.perf_counter()
    jax.block_until_ready([f(1 + i) for i in range(ITERS)])
    return (time.perf_counter() - t0) / ITERS * 1e3

def gen(i):
    return jax.random.uniform(jax.random.PRNGKey(i), (B, H, W2, 128),
                              jnp.float32).astype(jnp.bfloat16)

kw = jax.random.normal(jax.random.PRNGKey(7), (9, 128, 128),
                       jnp.bfloat16) * 0.05
cal = timed(jax.jit(lambda i: gen(i).astype(jnp.float32).sum()))

def k_chain(x_ref, w_ref, o_ref, *, wc):
    x = x_ref[0]
    for c0 in range(0, W2, wc):
        s = None
        for t in range(9):
            dy, dx = divmod(t, 3)
            rows = x[:T, c0:c0 + wc]  # ignore true shift
            p = jax.lax.dot_general(rows, w_ref[t],
                                    (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = p if s is None else s + p
        o_ref[0, :, c0:c0 + wc] = s.astype(jnp.bfloat16)

def k_concat(x_ref, w_ref, o_ref, *, ntap, wc):
    # ntap in (3, 9): concat ntap tiles along lanes -> K=128*ntap dots
    x = x_ref[0]
    wmat = w_ref[:].reshape(9 * 128, 128)
    for c0 in range(0, W2, wc):
        s = None
        for g in range(0, 9, ntap):
            tiles = [x[:T, c0:c0 + wc] for _ in range(ntap)]
            patch = jnp.concatenate(tiles, -1)  # (T, wc, 128*ntap)
            wg = wmat[g * 128:(g + ntap) * 128]
            p = jax.lax.dot_general(patch, wg, (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = p if s is None else s + p
        o_ref[0, :, c0:c0 + wc] = s.astype(jnp.bfloat16)

def run(kernel, label, **kw2):
    print("compiling", label, flush=True)
    f = pl.pallas_call(
        functools.partial(kernel, **kw2),
        out_shape=jax.ShapeDtypeStruct((B, H, W2, 128), jnp.bfloat16),
        grid=(B, H // T),
        in_specs=[pl.BlockSpec((1, T, W2, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T, W2, 128), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    g = jax.jit(lambda i: f(gen(i), kw).astype(jnp.float32).sum())
    t = timed(g) - cal
    print(f"{label:28s}: {t:6.2f} ms -> {FL/t/1e9:6.1f} TF/s", flush=True)

import os
which = os.environ.get("VARIANT", "chain512")
if which == "chain512":
    run(k_chain, "9x K=128 chain wc512", wc=512)
elif which == "chain128":
    run(k_chain, "9x K=128 chain wc128", wc=128)
elif which == "c3":
    run(k_concat, "3x K=384 concat wc256", ntap=3, wc=256)
elif which == "c9":
    run(k_concat, "1x K=1152 concat wc128", ntap=9, wc=128)
elif which == "c9s":
    run(k_concat, "1x K=1152 concat wc64", ntap=9, wc=64)
