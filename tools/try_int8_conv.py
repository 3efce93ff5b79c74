#!/usr/bin/env python
"""Probe: W8A8 int8 convolutions on the MXU vs bf16 (VERDICT r4 weak #1).

The round-2 int8 rejection covered only the FLOP-bound N=128 *stage
tails* inside the fused Pallas kernel (+13%, issue-bound). This probe
measures XLA's int8 conv lowering directly, per trunk shape, in three
variants:

  bf16      — production baseline (conv2d on bf16 weights/activations)
  int8-pre  — int8 activations already materialised + int8 weights,
              conv with preferred_element_type=int32, dequant (upper
              bound: pure conv rate + output dequant)
  int8-dyn  — bf16 activation -> per-tensor dynamic quantise -> int8
              conv -> dequant (realistic serving W8A8: quantisation
              overhead included)

Shapes: the flagship SuperPoint trunk stages at the bench operating
point (B=4 pairs = 8 images, 1024 px, width-folded layout — see
models/extractors/superpoint.py:37-42,96-113), plus DKM's ResNet-50
trunk shapes at 544x736 (matchers/dkm.py) where the r4 int8-linear pass
moved only +1.5% because every conv stayed bf16.

Results recorded in BASELINE.md (r5).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from imcui_tpu.utils.benchmark import chain_bench

# name, (B, H, W, Cin), (kh, kw), Cout, stride
SHAPES = [
    ("sp.conv1b.fold", (8, 1024, 512, 128), (3, 3), 128, 1),
    ("sp.conv2ab.fold", (8, 512, 256, 128), (3, 3), 128, 1),
    ("sp.conv3a.fold", (8, 256, 128, 256), (3, 3), 256, 1),
    ("sp.conv3b", (8, 256, 256, 128), (3, 3), 128, 1),
    ("sp.conv4ab", (8, 128, 128, 128), (3, 3), 128, 1),
    ("sp.convPa", (8, 128, 128, 128), (3, 3), 256, 1),
    ("sp.convDb", (8, 128, 128, 256), (1, 1), 256, 1),
    ("rn50.l2.3x3", (1, 68, 92, 128), (3, 3), 128, 1),
    ("rn50.l3.3x3", (1, 34, 46, 256), (3, 3), 256, 1),
    ("rn50.l4.3x3", (1, 17, 23, 512), (3, 3), 512, 1),
    ("rn50.l2.1x1", (1, 68, 92, 512), (1, 1), 128, 1),
]


def conv_bf16(w, b_, x):
    out = lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b_


def conv_int8(wq, ws, b_, xq, sx):
    acc = lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sx * ws) + b_


def main():
    rows = []
    for name, (b, h, w_, cin), (kh, kw), cout, stride in SHAPES:
        kw_ = {"shape": (b, h, w_, cin), "k": (kh, kw), "cout": cout}
        key = jax.random.PRNGKey(0)
        wf = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * 0.05
        bias = jnp.zeros((cout,), jnp.float32)
        ws = jnp.maximum(jnp.abs(wf).max((0, 1, 2)), 1e-12) / 127.0
        wq = jnp.clip(jnp.round(wf / ws), -127, 127).astype(jnp.int8)
        wbf = wf.astype(jnp.bfloat16)
        flops = 2 * b * h * w_ * kh * kw * cin * cout

        def step_bf16(params, k, acc):
            x = jax.random.uniform(k, (b, h, w_, cin), jnp.bfloat16)
            return acc + conv_bf16(params, bias, x).astype(jnp.float32).sum()

        def step_int8_pre(params, k, acc):
            x = jax.random.randint(k, (b, h, w_, cin), -127, 127, jnp.int8)
            return acc + conv_int8(params, ws, bias, x, 0.01).sum()

        def step_int8_dyn(params, k, acc):
            x = jax.random.uniform(k, (b, h, w_, cin), jnp.bfloat16)
            xf = x.astype(jnp.float32)
            sx = jnp.maximum(jnp.abs(xf).max(), 1e-12) / 127.0
            xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
            return acc + conv_int8(params, ws, bias, xq, sx).sum()

        iters = 30
        row = {"name": name, **kw_}
        try:
            dt, _ = chain_bench(step_bf16, wbf, iters=iters)
            row["bf16_ms"] = round(dt / iters * 1e3, 2)
            row["bf16_tfs"] = round(flops / (dt / iters) / 1e12, 1)
        except Exception as e:  # pragma: no cover
            row["bf16_err"] = str(e)[:120]
        try:
            dt, _ = chain_bench(step_int8_pre, wq, iters=iters)
            row["int8_pre_ms"] = round(dt / iters * 1e3, 2)
            row["int8_pre_tfs"] = round(flops / (dt / iters) / 1e12, 1)
        except Exception as e:
            row["int8_pre_err"] = str(e)[:120]
        try:
            dt, _ = chain_bench(step_int8_dyn, wq, iters=iters)
            row["int8_dyn_ms"] = round(dt / iters * 1e3, 2)
        except Exception as e:
            row["int8_dyn_err"] = str(e)[:120]
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\nsummary:")
    for r in rows:
        if "bf16_ms" in r and "int8_dyn_ms" in r:
            print(f"  {r['name']:16s} bf16 {r['bf16_ms']:7.2f}  "
                  f"int8-pre {r.get('int8_pre_ms', float('nan')):7.2f}  "
                  f"int8-dyn {r['int8_dyn_ms']:7.2f}  "
                  f"speedup(dyn) {r['bf16_ms'] / r['int8_dyn_ms']:.2f}x")


if __name__ == "__main__":
    main()
