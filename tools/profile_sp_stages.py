"""Per-stage trunk profile: 5 compiles (gen + 4 prefixes)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from imcui_tpu.models import layers
from imcui_tpu.models.extractors import superpoint as sp
from imcui_tpu.models.layers import conv2d, relu, max_pool
from imcui_tpu.ops import pallas_stage1

B, H, W = 8, 1024, 1024
ITERS = 20
params = sp.init_params(jax.random.PRNGKey(0))
bp = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

def timed(f):
    jax.block_until_ready(f(0))
    t0 = time.perf_counter()
    jax.block_until_ready([f(1 + i) for i in range(ITERS)])
    return (time.perf_counter() - t0) / ITERS * 1e3

def gen(i):
    return jax.random.uniform(jax.random.PRNGKey(i), (B, H, W, 1),
                              jnp.float32).astype(jnp.bfloat16)

def stage(y, pa, pb, hh, ww2):
    fa = layers.fold_conv3x3(pa)
    fb = layers.fold_conv3x3(pb)
    if pallas_stage1.supported(hh, ww2):
        y_raw = conv2d({"w": fa["w"]}, y)
        return pallas_stage1.stage_tail(
            y_raw.astype(jnp.bfloat16), fa["b"], fb["w"], fb["b"])
    y = relu(conv2d(fa, y))
    y = relu(conv2d(fb, y))
    return layers.max_pool_folded(y)

def upto(n):
    def f(i):
        y = layers.fold_width(gen(i))
        y = stage(y, bp["conv1a"], bp["conv1b"], H, W // 2)
        if n >= 2:
            y = stage(y, bp["conv2a"], bp["conv2b"], H // 2, W // 4)
        if n >= 3:
            y = layers.unfold_width(relu(conv2d(layers.fold_conv3x3(bp["conv3a"]), y)))
            y = relu(conv2d(bp["conv3b"], y))
            y = max_pool(y)
        if n >= 4:
            y = relu(conv2d(bp["conv4a"], y))
            y = relu(conv2d(bp["conv4b"], y))
        return y.astype(jnp.float32).sum()
    return jax.jit(f)

cal = timed(jax.jit(lambda i: gen(i).astype(jnp.float32).sum()))
ts = [timed(upto(n)) - cal for n in (1, 2, 3, 4)]
print(f"stage1 (fold+conv1a/b+pool): {ts[0]:6.2f} ms", flush=True)
print(f"stage2 (+conv2a/b+pool)    : {ts[1]:6.2f}  (+{ts[1]-ts[0]:.2f})", flush=True)
print(f"stage3 (+conv3a/b+pool)    : {ts[2]:6.2f}  (+{ts[2]-ts[1]:.2f})", flush=True)
print(f"stage4 (+conv4a/b)         : {ts[3]:6.2f}  (+{ts[3]-ts[2]:.2f})", flush=True)
