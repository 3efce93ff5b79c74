"""Per-layer SuperPoint trunk profiling on the real chip.

Axon-tunnel measurement rules (BASELINE.md): inputs must differ per
iteration and be generated ON DEVICE (repeated host buffers get
short-circuited and report fantasy numbers), and outputs are reduced to
scalars that are blocked on. Each stage is timed as gen(i)+layer and
corrected by subtracting a gen(i)-only calibration run.

Usage: python tools/profile_trunk.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from imcui_tpu.models import layers
from imcui_tpu.models.extractors import superpoint as sp

B, H, W = 8, 1024, 1024
ITERS = 20


def timed(f, iters=ITERS):
    jax.block_until_ready(f(0))
    t0 = time.perf_counter()
    accs = [f(1 + i) for i in range(iters)]
    jax.block_until_ready(accs)
    return (time.perf_counter() - t0) / iters * 1e3


def stage(name, fn, shape, dtype=jnp.bfloat16):
    def gen(i):
        return jax.random.uniform(jax.random.PRNGKey(i), shape, jnp.float32
                                  ).astype(dtype)

    g = jax.jit(lambda i: gen(i).astype(jnp.float32).sum())
    gl = jax.jit(lambda i: fn(gen(i)).astype(jnp.float32).sum())
    t_gen = timed(g)
    t_all = timed(gl)
    print(f"{name:32s} in={str(shape):22s} {t_all - t_gen:7.2f} ms"
          f"  (gen {t_gen:.2f})")
    return t_all - t_gen


def main():
    params = sp.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def conv(name):
        return lambda a: layers.relu(layers.conv2d(params[name], a))

    stage("trunk total", lambda a: sp.backbone(params, a), (B, H, W, 1))

    stage("conv1a+relu", conv("conv1a"), (B, H, W, 1))
    stage("conv1b+relu", conv("conv1b"), (B, H, W, 64))
    stage("pool1", layers.max_pool, (B, H, W, 64))
    stage("conv2a+relu", conv("conv2a"), (B, H // 2, W // 2, 64))
    stage("conv2b+relu", conv("conv2b"), (B, H // 2, W // 2, 64))
    stage("pool2", layers.max_pool, (B, H // 2, W // 2, 64))
    stage("conv3a+relu", conv("conv3a"), (B, H // 4, W // 4, 64))
    stage("conv3b+relu", conv("conv3b"), (B, H // 4, W // 4, 128))
    stage("pool3", layers.max_pool, (B, H // 4, W // 4, 128))
    stage("conv4a+relu", conv("conv4a"), (B, H // 8, W // 8, 128))
    stage("conv4b+relu", conv("conv4b"), (B, H // 8, W // 8, 128))

    def stem1(a):
        v = conv("conv1a")(a)
        v = conv("conv1b")(v)
        return layers.max_pool(v)

    stage("stage1 fused (1a,1b,pool)", stem1, (B, H, W, 1))

    def stem2(a):
        v = conv("conv2a")(a)
        v = conv("conv2b")(v)
        return layers.max_pool(v)

    stage("stage2 fused (2a,2b,pool)", stem2, (B, H // 2, W // 2, 64))


if __name__ == "__main__":
    main()
