"""conv1a at fold factor F: kernel (3,3,F,64F), contraction 9F, N=64F.
Output (B,H,W/F,64F) reshapes FLAT-EXACTLY to fold-2 (B,H,W2,128)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from imcui_tpu.models import layers

B, H, W = 8, 1024, 1024
ITERS = 20

def fold_conv3x3_F(p, F):
    w = p["w"]  # (3,3,1,C)
    C = w.shape[-1]
    wf = np.zeros((3, 3, F, F * C), np.float32)
    for dxf in range(3):          # folded tap index (w_F + dxf - 1)
        for q in range(F):        # input slot parity
            for pp in range(F):   # output slot parity
                dxr = F * (dxf - 1) + q - pp + 1   # real 3x3 tap index
                if 0 <= dxr <= 2:
                    wf[:, dxf, q, pp * C:(pp + 1) * C] = np.asarray(
                        w[:, dxr, 0, :])
    return {"w": jnp.asarray(wf)}

def fold_width_F(x, F):
    b, h, w, c = x.shape
    return x.reshape(b, h, w // F, F * c)

def timed(f):
    jax.block_until_ready(f(0))
    t0 = time.perf_counter()
    jax.block_until_ready([f(1 + i) for i in range(ITERS)])
    return (time.perf_counter() - t0) / ITERS * 1e3

pa = {"w": jax.random.normal(jax.random.PRNGKey(1), (3, 3, 1, 64),
                             jnp.float32) * 0.3}
fa2 = layers.fold_conv3x3({"w": pa["w"], "b": jnp.zeros((64,))})

def gen(i):
    return jax.random.uniform(jax.random.PRNGKey(i), (B, H, W, 1),
                              jnp.float32).astype(jnp.bfloat16)

cal = timed(jax.jit(lambda i: gen(i).astype(jnp.float32).sum()))

# correctness: foldF output reshaped == fold2 conv output
img = gen(0)
ref = layers.conv2d({"w": fa2["w"].astype(jnp.bfloat16)},
                    layers.fold_width(img))
for F in (4, 8, 16):
    faF = fold_conv3x3_F(pa, F)
    out = layers.conv2d({"w": faF["w"].astype(jnp.bfloat16)},
                        fold_width_F(img, F))
    out2 = out.reshape(ref.shape)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - out2.astype(jnp.float32))))
    print(f"F={F}: reshape-exact err {err:.5f}", flush=True)

cur = jax.jit(lambda i: layers.conv2d(
    {"w": fa2["w"].astype(jnp.bfloat16)},
    layers.fold_width(gen(i))).astype(jnp.float32).sum())
print(f"F=2 (current): {timed(cur)-cal:6.2f} ms", flush=True)
for F in (4, 8, 16):
    faF = {"w": fold_conv3x3_F(pa, F)["w"].astype(jnp.bfloat16)}
    g = jax.jit(lambda i, faF=faF, F=F: layers.conv2d(
        faF, fold_width_F(gen(i), F)).reshape(
        B, H, W // 2, 128).astype(jnp.float32).sum())
    print(f"F={F} (+reshape): {timed(g)-cal:6.2f} ms", flush=True)
