"""LoFTR whole-program stage attribution on the real chip (r5).

The MFU scoreboard put LoFTR at 0.08 MFU / 0.22 HBM-bound-upper — the
largest unexplained gap in the tier table. Same method as
profile_roma_stages.py: time TRUNCATED versions of the FULL program
(each returns a reduced scalar) and difference successive stages, which
is immune to the ~2.4 ms per-program tunnel dispatch floor.

Stages: backbone -> +coarse transformer -> +coarse match -> full
(fine windows + fine transformer + subpixel expectation).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imcui_tpu.models.matchers import loftr as m
from imcui_tpu.utils.benchmark import chain_bench

B, H, W = 2, 480, 640
CONF = {"temperature": 0.1, "match_threshold": 0.2, "max_matches": 1024}


def make_step(stage):
    wh = jnp.asarray([W, H], jnp.int32)

    def one(params, img0, img1):
        featc, featf = m.backbone_apply(params["backbone"], jnp.stack(
            [img0, img1], 0))
        hc, wc = featc.shape[1:3]
        if stage == "backbone":
            return featc.astype(jnp.float32).sum() + featf.astype(
                jnp.float32).sum()
        pe = m.position_encoding(hc, wc)
        fc0 = (featc[0] + pe).reshape(-1, m.D_COARSE)
        fc1 = (featc[1] + pe).reshape(-1, m.D_COARSE)

        ys = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
        msk = ((xs < wh[0] // 8) & (ys < wh[1] // 8)).reshape(-1)

        for i, layer in enumerate(params["loftr_coarse"]["layers"]):
            if i % 2 == 0:
                fc0 = m.encoder_layer(layer, fc0, fc0, mask_src=msk)
                fc1 = m.encoder_layer(layer, fc1, fc1, mask_src=msk)
            else:
                fc0n = m.encoder_layer(layer, fc0, fc1, mask_src=msk)
                fc1 = m.encoder_layer(layer, fc1, fc0, mask_src=msk)
                fc0 = fc0n
        if stage == "coarse_tf":
            return fc0.astype(jnp.float32).sum() + fc1.astype(
                jnp.float32).sum()
        idx0, idx1, score, valid = m.coarse_match(
            fc0, fc1, msk, msk, **{"temperature": 0.1,
                                   "threshold": 0.2, "max_matches": 1024})
        if stage == "coarse_match":
            return (score.sum() + idx0.astype(jnp.float32).sum()
                    + idx1.astype(jnp.float32).sum())
        out = m.forward_pair(params, img0, img1, wh, wh, CONF)
        return (out["scores"].astype(jnp.float32).sum()
                + out["keypoints1"].astype(jnp.float32).sum())

    def step(params, key, acc):
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (B, H, W, 1), jnp.float32)
        i1 = jax.random.uniform(k1, (B, H, W, 1), jnp.float32)
        vals = jax.vmap(lambda a, b: one(params, a, b))(i0, i1)
        return acc + vals.sum()

    return step


def main():
    params = m.init_params(jax.random.PRNGKey(0))
    prev = 0.0
    for stage in ("backbone", "coarse_tf", "coarse_match", "full"):
        dt, _ = chain_bench(make_step(stage), params, iters=20)
        ms = dt / 20 * 1e3 / B
        print(json.dumps({"stage": stage, "ms_per_pair": round(ms, 2),
                          "delta": round(ms - prev, 2)}), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
