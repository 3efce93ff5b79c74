"""Round-3 conv1a experiments (VERDICT r2 #4: conv1a sits ~4 ms over floor).

Variants measured on the real chip at the flagship operating point
(8 images, 1024², bf16). Baseline A is what superpoint.backbone runs
today (folded XLA conv, K=3·3·2=18 vs 128 lanes ≈ 2.8 TF/s effective).
All variants produce the identical folded (B, H, W/2, 128) activation
(max |Δ| printed vs A).

Measurement rules per BASELINE.md: on-device inputs per iter, scalar
reduction, one block at the end.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from imcui_tpu.models import layers
from imcui_tpu.models.layers import conv2d

B, H, W = 8, 1024, 1024
W2 = W // 2
ITERS = 30


def make_params():
    rng = jax.random.PRNGKey(0)
    p = {"w": jax.random.normal(rng, (3, 3, 1, 64)) * 0.2,
         "b": jnp.zeros((64,))}
    return p


def v_a_folded(p, img):            # current production path
    fa = layers.fold_conv3x3(p)
    xf = layers.fold_width(img)
    return conv2d({"w": fa["w"]}, xf.astype(jnp.bfloat16))


def v_b_unfolded(p, img):          # plain conv then fold reshape
    y = conv2d({"w": p["w"]}, img.astype(jnp.bfloat16))
    return layers.fold_width(y)


def v_d_im2col(p, img):            # explicit 18-slice im2col + dot
    fa = layers.fold_conv3x3(p)["w"]          # (3, 3, 2, 128)
    xf = layers.fold_width(img).astype(jnp.bfloat16)   # (B,H,W2,2)
    xp = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + H, dx:dx + W2, :] for dy in range(3)
            for dx in range(3)]
    a = jnp.concatenate(cols, -1)             # (B,H,W2,18)
    w = fa.reshape(18, 128).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, w, (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def v_g_f32(p, img):               # f32 conv (different MXU path)
    fa = layers.fold_conv3x3(p)
    xf = layers.fold_width(img)
    return conv2d({"w": fa["w"].astype(jnp.float32)},
                  xf.astype(jnp.float32)).astype(jnp.bfloat16)


def v_h_dy_split(p, img):          # three 1x3 folded convs summed
    fa = layers.fold_conv3x3(p)["w"]          # (3,3,2,128)
    xf = layers.fold_width(img).astype(jnp.bfloat16)
    xp = jnp.pad(xf, ((0, 0), (1, 1), (0, 0), (0, 0)))
    out = 0.0
    for dy in range(3):
        out = out + conv2d({"w": fa[dy:dy + 1]}, xp[:, dy:dy + H])
    return out


VARIANTS = [("A_folded_xla", v_a_folded), ("B_unfolded", v_b_unfolded),
            ("D_im2col_dot", v_d_im2col), ("G_f32", v_g_f32),
            ("H_dy_split", v_h_dy_split)]


def main():
    p = make_params()

    # correctness vs A on one input
    img0 = jax.random.uniform(jax.random.PRNGKey(9), (B, H, W, 1),
                              jnp.bfloat16)
    ref = jax.jit(VARIANTS[0][1])(p, img0).astype(jnp.float32)
    for name, fn in VARIANTS[1:]:
        got = jax.jit(fn)(p, img0).astype(jnp.float32)
        print(f"{name}: max|d| = {jnp.abs(got - ref).max():.5f}",
              flush=True)

    for name, fn in VARIANTS:
        @jax.jit
        def step(key, fn=fn):
            img = jax.random.uniform(key, (B, H, W, 1), jnp.bfloat16)
            return fn(p, img).astype(jnp.float32).sum()

        for i in range(3):
            jax.block_until_ready(step(jax.random.PRNGKey(100 + i)))
        t0 = time.perf_counter()
        accs = [step(jax.random.PRNGKey(i)) for i in range(ITERS)]
        jax.block_until_ready(accs)
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name}: {dt:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
