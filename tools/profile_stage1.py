"""Stage-1 dissection + HBM bandwidth roofline."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from imcui_tpu.models import layers
from imcui_tpu.models.extractors import superpoint as sp
from imcui_tpu.models.layers import conv2d
from imcui_tpu.ops import pallas_stage1

B, H, W = 8, 1024, 1024
ITERS = 20
params = sp.init_params(jax.random.PRNGKey(0))
bp = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
fa = layers.fold_conv3x3(bp["conv1a"])
fb = layers.fold_conv3x3(bp["conv1b"])

def timed(f):
    jax.block_until_ready(f(0))
    t0 = time.perf_counter()
    jax.block_until_ready([f(1 + i) for i in range(ITERS)])
    return (time.perf_counter() - t0) / ITERS * 1e3

# HBM bandwidth: copy 537 MB
@jax.jit
def bwtest(i):
    x = jax.random.uniform(jax.random.PRNGKey(i), (B, 1024, 512, 64),
                           jnp.float32).astype(jnp.bfloat16)
    return (x + 1).astype(jnp.float32).sum()
cal0 = timed(jax.jit(lambda i: jax.random.uniform(
    jax.random.PRNGKey(i), (B, 1024, 512, 64), jnp.float32
).astype(jnp.bfloat16).astype(jnp.float32).sum()))
t_bw = timed(bwtest)
print(f"x+1 over 537MB bf16 incl gen: {t_bw:6.2f} ms  (gen-only {cal0:.2f})", flush=True)

def gen(i):
    return jax.random.uniform(jax.random.PRNGKey(i), (B, H, W, 1),
                              jnp.float32).astype(jnp.bfloat16)
cal = timed(jax.jit(lambda i: gen(i).astype(jnp.float32).sum()))

@jax.jit
def conv1a_only(i):
    y = layers.fold_width(gen(i))
    return conv2d({"w": fa["w"]}, y).astype(jnp.float32).sum()
t1a = timed(conv1a_only) - cal
print(f"fold+conv1a(raw)            : {t1a:6.2f} ms", flush=True)

@jax.jit
def s1_full(i):
    y = layers.fold_width(gen(i))
    y_raw = conv2d({"w": fa["w"]}, y)
    out = pallas_stage1.stage_tail(y_raw.astype(jnp.bfloat16), fa["b"],
                                   fb["w"], fb["b"])
    return out.astype(jnp.float32).sum()
t_s1 = timed(s1_full) - cal
print(f"stage1 full                 : {t_s1:6.2f} ms  (tail {t_s1 - t1a:.2f})", flush=True)
