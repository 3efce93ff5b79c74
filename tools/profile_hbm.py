"""HBM bandwidth + conv1a decomposition. Axon rules: on-device gen,
scalar outputs collected then blocked once; optimization_barrier forces
intermediates to materialize in HBM."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax import lax
from imcui_tpu.models import layers
from imcui_tpu.models.extractors import superpoint as sp

B, H, W = 8, 1024, 1024
ITERS = 20
params = sp.init_params(jax.random.PRNGKey(0))
bp = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
fa = layers.fold_conv3x3(bp["conv1a"])

def timed(f):
    jax.block_until_ready(f(0))
    t0 = time.perf_counter()
    jax.block_until_ready([f(1 + i) for i in range(ITERS)])
    return (time.perf_counter() - t0) / ITERS * 1e3

def gen_big(i):
    return jax.random.uniform(jax.random.PRNGKey(i), (B, 1024, 512, 128),
                              jnp.float32).astype(jnp.bfloat16)

t_fused = timed(jax.jit(lambda i: gen_big(i).astype(jnp.float32).sum()))
t_mat = timed(jax.jit(lambda i: lax.optimization_barrier(
    gen_big(i)).astype(jnp.float32).sum()))
d = t_mat - t_fused
print(f"gen+sum fused: {t_fused:5.2f}  +barrier(w537+r537): {t_mat:5.2f}"
      f"  delta {d:5.2f} ms -> {1.074/d*1e3:5.0f} GB/s", flush=True)

def gen_img(i):
    return jax.random.uniform(jax.random.PRNGKey(i), (B, H, W, 1),
                              jnp.float32).astype(jnp.bfloat16)

cal = timed(jax.jit(lambda i: gen_img(i).astype(jnp.float32).sum()))
# conv1a + barrier + sum: write537 + read537 on top of the conv compute
t_conv = timed(jax.jit(lambda i: lax.optimization_barrier(layers.conv2d(
    {"w": fa["w"]}, layers.fold_width(gen_img(i)))).astype(jnp.float32).sum()))
print(f"img cal: {cal:5.2f}  conv1a+barrier+sum: {t_conv:6.2f}"
      f" -> conv1a+rt {t_conv - cal:6.2f} ms", flush=True)
# conv1a with sum fused directly (no barrier): may skip the HBM write
t_cf = timed(jax.jit(lambda i: layers.conv2d(
    {"w": fa["w"]}, layers.fold_width(gen_img(i))).astype(jnp.float32).sum()))
print(f"conv1a+fusedsum: {t_cf:6.2f} -> conv compute ~{t_cf - cal:6.2f} ms", flush=True)
