"""Postproc split: NMS / topk / sampling at 8x1024^2."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from imcui_tpu.ops import nms as nms_ops

B, H, W, K = 8, 1024, 1024, 1024
ITERS = 20

def timed(f):
    jax.block_until_ready(f(0))
    t0 = time.perf_counter()
    jax.block_until_ready([f(1 + i) for i in range(ITERS)])
    return (time.perf_counter() - t0) / ITERS * 1e3

def gen_heat(i):
    return jax.random.uniform(jax.random.PRNGKey(i), (B, H, W), jnp.float32)

def gen_desc(i):
    return jax.random.normal(jax.random.PRNGKey(i), (B, 128, 128, 256),
                             jnp.float32)

cal = timed(jax.jit(lambda i: gen_heat(i).sum()))
cal_d = timed(jax.jit(lambda i: gen_desc(i).sum()))

nms = jax.jit(lambda i: jax.vmap(
    lambda s: nms_ops.simple_nms(s, 4))(gen_heat(i)).sum())
t_nms = timed(nms) - cal
print(f"simple_nms x8      : {t_nms:6.2f} ms", flush=True)

def tk(i):
    heat = gen_heat(i)
    k, s, m = jax.vmap(
        lambda sc: nms_ops.select_topk_keypoints(sc, K, 0.0005))(heat)
    return k.sum() + s.sum()
t_tk = timed(jax.jit(tk)) - cal
print(f"approx topk x8     : {t_tk:6.2f} ms", flush=True)

def samp(i):
    d = gen_desc(i)
    kp = jax.random.uniform(jax.random.PRNGKey(i + 3), (B, K, 2)) * 1000
    out = jax.vmap(lambda kk, dd: nms_ops.sample_descriptors(
        kk, dd.transpose(2, 0, 1), s=8))(kp, d)
    return out.sum()
t_s = timed(jax.jit(samp)) - cal_d
print(f"desc sampling x8   : {t_s:6.2f} ms", flush=True)
