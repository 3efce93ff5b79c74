"""Coarse SuperPoint profile: trunk / heads / postproc, 4 compiles total."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from imcui_tpu.models.extractors import superpoint as sp

B, H, W, N = 8, 1024, 1024, 1024
ITERS = 20
params = sp.init_params(jax.random.PRNGKey(0))
bparams = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
valid = jnp.tile(jnp.asarray([[W, H]], jnp.int32), (B, 1))

def timed(f):
    jax.block_until_ready(f(0))
    t0 = time.perf_counter()
    jax.block_until_ready([f(1 + i) for i in range(ITERS)])
    return (time.perf_counter() - t0) / ITERS * 1e3

def gen(i):
    return jax.random.uniform(jax.random.PRNGKey(i), (B, H, W, 1),
                              jnp.float32).astype(jnp.bfloat16)

cal = timed(jax.jit(lambda i: gen(i).astype(jnp.float32).sum()))
print(f"gen cal: {cal:.2f}", flush=True)

@jax.jit
def trunk(i):
    return sp.backbone(bparams, gen(i)).astype(jnp.float32).sum()
t_trunk = timed(trunk) - cal
print(f"trunk        : {t_trunk:7.2f} ms", flush=True)

@jax.jit
def trunk_heads(i):
    f = sp.backbone(bparams, gen(i))
    s = sp.dense_scores(bparams, f)
    d = sp.dense_descriptors(bparams, f)
    return s.sum() + d.sum()
t_th = timed(trunk_heads) - cal
print(f"trunk+heads  : {t_th:7.2f} ms  (heads {t_th - t_trunk:.2f})", flush=True)

@jax.jit
def full(i):
    x = gen(i).astype(jnp.float32).transpose(0, 3, 1, 2)
    f = sp.apply(params, x, valid, max_keypoints=N,
                 keypoint_threshold=0.0005, precision="bf16")
    return f["keypoints"].sum() + f["descriptors"].astype(jnp.float32).sum()
t_full = timed(full) - cal
print(f"full apply   : {t_full:7.2f} ms  (postproc {t_full - t_th:.2f})", flush=True)
