"""Validate ops/pallas_nms.py COMPILED on the real chip (the pytest
case runs interpret mode on CPU only) + time it against the XLA chain.

1. nms_cellmax compiled vs the XLA simple_nms -> border_mask -> 4x4
   cell reduction, f32 input (exact) and bf16 input.
2. select_keypoints vs the XLA select_topk path: keypoint sets must
   agree up to approx_max_k's near-tie class.
3. isolated postproc timing, both paths, chain_bench.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from imcui_tpu.ops import nms as nms_ops
from imcui_tpu.ops import pallas_nms
from imcui_tpu.utils.benchmark import chain_bench

B, H, W = 8, 1024, 1024
RADIUS, BORDER, K, THR = 4, 4, 1024, 0.005


def xla_cellmax(heat, valid_wh):
    def per_image(scores, vwh):
        s = nms_ops.simple_nms(scores.astype(jnp.float32), RADIUS)
        s = s * nms_ops.border_mask(H, W, BORDER, valid_wh=vwh,
                                    dtype=s.dtype)
        r = s.reshape(H // 4, 4, W // 4, 4).transpose(0, 2, 1, 3)
        r = r.reshape(H // 4, W // 4, 16)
        return r.max(-1), r.argmax(-1)
    return jax.vmap(per_image)(heat, valid_wh)


def main():
    rng = np.random.default_rng(3)
    heat_f = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
    heat = heat_f.astype(jnp.bfloat16)
    valid_wh = jnp.asarray(
        [[W, H]] * 4 + [[900, 1000], [1024, 700], [640, 480], [333, 222]],
        jnp.int32)

    cmax, csub = jax.jit(pallas_nms.nms_cellmax, static_argnames=(
        "radius", "border"))(heat, valid_wh, RADIUS, BORDER)
    rmax, rarg = jax.jit(xla_cellmax)(heat, valid_wh)
    cmax, csub = np.asarray(cmax), np.asarray(csub)
    rmax, rarg = np.asarray(rmax), np.asarray(rarg)
    bad = np.abs(cmax - rmax).max()
    print(f"cellmax max|d| = {bad}", flush=True)
    assert bad == 0.0, "compiled kernel diverges from XLA chain"
    sel = rmax > 0
    pos_disagree = int(((rarg != csub) & sel).sum())
    print(f"argpos disagreements (ties allowed): {pos_disagree} "
          f"of {int(sel.sum())}", flush=True)

    # end-to-end keypoint sets
    kp, ks, m = pallas_nms.select_keypoints(heat, valid_wh, K, THR,
                                            radius=RADIUS, border=BORDER)
    def xla_select(heat, valid_wh):
        def per_image(scores, vwh):
            s = nms_ops.simple_nms(scores, RADIUS)
            s = s * nms_ops.border_mask(H, W, BORDER, valid_wh=vwh,
                                        dtype=s.dtype)
            return nms_ops.select_topk_keypoints(s, K, THR)
        return jax.vmap(per_image)(heat, valid_wh)
    kp2, ks2, m2 = jax.jit(xla_select)(heat, valid_wh)
    # both paths end in approx_max_k (recall 0.99) over a bf16 heatmap:
    # at K=1024 from ~13k NMS survivors whose bf16 scores near 1.0
    # quantise to ~2^-8, the selection-boundary tie class is hundreds of
    # points, so set-jaccard is meaningless. The correct bar: every
    # DISAGREEING keypoint must score at/above the boundary (a legal
    # alternate tie member), except approx_max_k's 1% recall slack.
    for b in range(B):
        mb, mb2 = np.asarray(m[b]), np.asarray(m2[b])
        s1 = {tuple(x) for x in np.asarray(kp[b])[mb]}
        s2 = {tuple(x) for x in np.asarray(kp2[b])[mb2]}
        j = len(s1 & s2) / max(1, len(s1 | s2))
        boundary = max(np.asarray(ks[b])[mb].min(),
                       np.asarray(ks2[b])[mb2].min())
        sc1 = {tuple(x): float(s) for x, s in
               zip(np.asarray(kp[b])[mb], np.asarray(ks[b])[mb])}
        sc2 = {tuple(x): float(s) for x, s in
               zip(np.asarray(kp2[b])[mb2], np.asarray(ks2[b])[mb2])}
        below = [x for x in (s1 ^ s2)
                 if {**sc1, **sc2}[x] < boundary * 0.999]
        print(f"img{b}: pallas {len(s1)} kpts, xla {len(s2)}, "
              f"jaccard {j:.4f}, boundary {boundary:.4f}, "
              f"sub-boundary disagreements {len(below)}", flush=True)
        assert len(below) <= 0.02 * max(len(s1), len(s2)), \
            "disagreements beyond the approx_max_k recall+tie class"

    # isolated postproc timing
    def step_pallas(_, key, acc):
        h = jax.random.uniform(key, (B, H, W), jnp.bfloat16)
        kp, ks, m = pallas_nms.select_keypoints(h, valid_wh, K, THR,
                                                radius=RADIUS,
                                                border=BORDER)
        return acc + ks.sum() + kp.sum()

    def step_xla(_, key, acc):
        h = jax.random.uniform(key, (B, H, W), jnp.bfloat16)
        kp, ks, m = xla_select(h, valid_wh)
        return acc + ks.astype(jnp.float32).sum() + kp.sum()

    for name, fn in (("pallas", step_pallas), ("xla", step_xla)):
        dt, _ = chain_bench(fn, None, iters=50)
        print(f"postproc[{name}]: {1000 * dt / 50:.3f} ms / 8 imgs",
              flush=True)


if __name__ == "__main__":
    main()
