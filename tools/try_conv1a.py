"""conv1a reformulations, measured. Folded target: (B,H,W2,128),
out[b,h,w2,p*64+c] = sum_{dy,dx} k[dy,dx,c]*img[b,h+dy-1,2w2+p+dx-1]."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from imcui_tpu.models import layers
from imcui_tpu.models.extractors import superpoint as sp

B, H, W = 8, 1024, 1024
W2 = W // 2
ITERS = 20
params = sp.init_params(jax.random.PRNGKey(0))
bp = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
fa = layers.fold_conv3x3(bp["conv1a"])
k1a = bp["conv1a"]["w"]  # (3,3,1,64)

def timed(f):
    jax.block_until_ready(f(0))
    t0 = time.perf_counter()
    jax.block_until_ready([f(1 + i) for i in range(ITERS)])
    return (time.perf_counter() - t0) / ITERS * 1e3

def gen(i):
    return jax.random.uniform(jax.random.PRNGKey(i), (B, H, W, 1),
                              jnp.float32).astype(jnp.bfloat16)

cal = timed(jax.jit(lambda i: gen(i).astype(jnp.float32).sum()))

# current: folded conv via conv_general
cur = jax.jit(lambda i: layers.conv2d(
    {"w": fa["w"]}, layers.fold_width(gen(i))).astype(jnp.float32).sum())
t0 = timed(cur) - cal
print(f"current folded conv1a : {t0:6.2f} ms", flush=True)

# (a) stencil: 12 broadcast-FMAs on the folded image
def stencil(img):
    imf = img.reshape(B, H, W2, 2)
    q0 = imf[..., 0:1]
    q1 = imf[..., 1:2]
    zc = jnp.zeros((B, H, 1, 1), imf.dtype)
    q1m = jnp.concatenate([zc, q1[:, :, :-1]], 2)
    q0p = jnp.concatenate([q0[:, :, 1:], zc], 2)
    k = k1a[:, :, 0]  # (3,3,64) dx: 0=-1,1=0,2=+1
    z64 = jnp.zeros((64,), k.dtype)
    kv = {  # slice -> (3,128) lane vectors [p0 | p1]
        "q0": jnp.concatenate([k[:, 1], k[:, 0]], -1),
        "q1": jnp.concatenate([k[:, 2], k[:, 1]], -1),
        "q1m": jnp.concatenate([k[:, 0], jnp.tile(z64, (3, 1))], -1),
        "q0p": jnp.concatenate([jnp.tile(z64, (3, 1)), k[:, 2]], -1),
    }
    zrow = jnp.zeros((B, 1, W2, 1), imf.dtype)
    def rows(x, dy):  # img rows h+dy-1
        if dy == 0:
            return jnp.concatenate([zrow, x[:, :-1]], 1)
        if dy == 2:
            return jnp.concatenate([x[:, 1:], zrow], 1)
        return x
    acc = jnp.zeros((B, H, W2, 128), jnp.float32)
    for name, x in (("q0", q0), ("q1", q1), ("q1m", q1m), ("q0p", q0p)):
        for dy in range(3):
            acc = acc + rows(x, dy).astype(jnp.float32) * kv[name][dy].astype(jnp.float32)
    return acc.astype(jnp.bfloat16)

sten = jax.jit(lambda i: stencil(gen(i)).astype(jnp.float32).sum())
t_a = timed(sten) - cal
print(f"stencil 12-FMA conv1a : {t_a:6.2f} ms", flush=True)

# (b) patch K=12 matmul
def patchmm(img):
    imgp = jnp.pad(img[..., 0], ((0, 0), (1, 1), (1, 2)))  # (B,H+2,W+3)
    # 12 taps: dy 0..2, xpos 0..3 covering 2w2-1 .. 2w2+2
    taps = [imgp[:, dy:dy + H, xp:xp + W:2][..., None]
            for dy in range(3) for xp in range(4)]
    P = jnp.concatenate(taps, -1)  # (B,H,W2,12)
    # kernel (12,128): tap (dy,xp) -> p0 uses dx=xp-0? p0 pos 2w2-1+dx' ...
    # p0 taps at xpos 0,1,2 with k[dy,0..2]; p1 at xpos 1,2,3 with k[dy,0..2]
    km = jnp.zeros((3, 4, 128), k1a.dtype)
    k = k1a[:, :, 0]
    for dx in range(3):
        km = km.at[:, dx, :64].set(k[:, dx])
        km = km.at[:, dx + 1, 64:].set(k[:, dx])
    km = km.reshape(12, 128)
    return jax.lax.dot_general(P, km, (((3,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

pm = jax.jit(lambda i: patchmm(gen(i)).astype(jnp.float32).sum())
t_b = timed(pm) - cal
print(f"patch K=12 matmul     : {t_b:6.2f} ms", flush=True)

# correctness vs current
img = gen(0)
ref = layers.conv2d({"w": fa["w"]}, layers.fold_width(img))
oa = stencil(img)
ob = patchmm(img).astype(jnp.bfloat16)
print("stencil err:", float(jnp.max(jnp.abs(ref.astype(jnp.float32) - oa.astype(jnp.float32)))),
      " patch err:", float(jnp.max(jnp.abs(ref.astype(jnp.float32) - ob.astype(jnp.float32)))), flush=True)
