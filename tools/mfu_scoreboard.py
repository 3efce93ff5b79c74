#!/usr/bin/env python
"""MFU scoreboard: hardware-anchored utilization per tier (VERDICT r4 #6).

The headline `vs_baseline` multiplier divides by a paper-derived A100
estimate (BASELINE.md) — honest but unfalsifiable here. This tool
anchors every tier's perf claim to the hardware instead: it compiles
each tier's EXACT bench step (the same functions tools/bench_heavy.py
and bench.py time on the real chip) on the CPU backend, reads the XLA
cost analysis (FLOPs + bytes accessed are backend-independent HLO
properties), and combines them with the measured ms/pair recorded in
BASELINE_heavy.jsonl / BENCH_r*.json:

    achieved TF/s = flops_per_pair / measured_s_per_pair
    MFU           = achieved TF/s / peak TF/s   (197 bf16 / 394 int8 on
                                                 one v5e-lite chip)
    HBM util      = bytes_per_pair / measured_s_per_pair / 0.8 TB/s

A tier can be honestly "slow" in MFU terms and still at its roofline
when it is bandwidth-bound — both columns are printed so the binding
constraint is visible per tier.

Run on CPU (no chip needed):  JAX_PLATFORMS=cpu python tools/mfu_scoreboard.py
Writes the table to stdout; results are recorded in BASELINE.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

PEAK_BF16_TFS = 197.0   # v5e bf16 MXU peak (BASELINE.md perf model)
PEAK_INT8_TFS = 394.0   # 2x bf16 on the int8 MXU path
HBM_TBS = 0.8           # ~1 TB/s nominal; 0.8 sustained (profile_hbm.py)

# measured ms/pair on the real chip (latest rows of BASELINE_heavy.jsonl
# + BENCH_r04.json flagship). Re-run those benches to refresh.
MEASURED_MS_PER_PAIR = {
    "flagship_bf16": 34.1 / 4,          # 117.23 pairs/s at B=4
    "loftr_bf16": 4.29,                 # r5 LSE dual-softmax row (f32 naive: 11.3)
    "roma_bf16": 76.26,
    "roma_int8": 73.44,
    "dkm_bf16": 61.61,
    "dkm_int8": 60.73,
    "duster_bf16": 1000 / 30.5,
    "duster_int8": 28.79,
    "mast3r_bf16": 41.01,
    "mast3r_int8": 25.65,
}


def cost_of(step, params, *example):
    """Compile on CPU, return (flops, bytes) per execution."""
    c = jax.jit(step).lower(params, *example).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(
        ca.get("bytes accessed", 0.0))


def flagship():
    from imcui_tpu.pipeline import two_view

    B, H, W, MK, NL = 4, 1024, 1024, 1024, 9
    params = two_view.init_params(n_layers=NL)
    valid = jnp.tile(jnp.asarray([[W, H]], jnp.int32), (B, 1))

    def step(params, key, acc):
        k0, k1, k2 = jax.random.split(key, 3)
        i0 = jax.random.uniform(k0, (B, 1, H, W), jnp.float32)
        i1 = jax.random.uniform(k1, (B, 1, H, W), jnp.float32)
        out = two_view.match_step(
            params, i0, i1, valid, valid, k2, max_keypoints=MK,
            n_layers=NL, num_hypotheses=512, ransac="fundamental")
        return acc + out["matching_scores0"].sum() + out["num_inliers"].sum()

    f, by = cost_of(step, params, jax.random.PRNGKey(0), jnp.float32(0))
    return f / B, by / B


def loftr():
    from imcui_tpu.models.matchers import loftr as m

    B, H, W = 2, 480, 640
    params = m.init_params(jax.random.PRNGKey(0))
    conf_key = (("match_threshold", 0.2), ("max_matches", 1024),
                ("temperature", 0.1))
    wh = jnp.tile(jnp.asarray([[W, H]], jnp.int32), (B, 1))

    def step(params, key, acc):
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (B, H, W, 1), jnp.float32)
        i1 = jax.random.uniform(k1, (B, H, W, 1), jnp.float32)
        out = m._apply_batched(params, i0, i1, wh, wh, conf_key)
        return acc + out["scores"].astype(jnp.float32).sum()

    f, by = cost_of(step, params, jax.random.PRNGKey(0), jnp.float32(0))
    return f / B, by / B


def roma():
    from imcui_tpu.models.matchers import roma as m

    B, R = 1, 560
    params = m.init_params(jax.random.PRNGKey(0), {"dinov2_variant": "vitl14"})
    conf_key = (("dinov2_variant", "vitl14"),)

    def step(params, key, acc):
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (B, R, R, 3), jnp.float32)
        i1 = jax.random.uniform(k1, (B, R, R, 3), jnp.float32)
        out = m._apply_batched(params, i0, i1, 2048, conf_key)
        return acc + out["scores"].astype(jnp.float32).sum()

    f, by = cost_of(step, params, jax.random.PRNGKey(0), jnp.float32(0))
    return f / B, by / B


def dkm():
    from imcui_tpu.models.matchers import dkm as m

    B, H, W = 1, 544, 736
    params = m.init_params(jax.random.PRNGKey(0))

    def step(params, key, acc):
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (B, H, W, 3), jnp.float32)
        i1 = jax.random.uniform(k1, (B, H, W, 3), jnp.float32)
        out = m._apply_batched(params, i0, i1, 2048)
        return acc + out["scores"].astype(jnp.float32).sum()

    f, by = cost_of(step, params, jax.random.PRNGKey(0), jnp.float32(0))
    return f / B, by / B


def duster():
    from imcui_tpu.models.matchers import duster as m
    from imcui_tpu.ops import ransac as ransac_ops

    B, R = 1, 512
    conf = dict(m.PUBLISHED, max_matches=2048, subsample=8)
    params = m.init_params(jax.random.PRNGKey(0), conf)
    conf_key = tuple(sorted(
        {k: conf[k] for k in
         ("enc_dim", "enc_depth", "enc_heads", "dec_dim", "dec_depth",
          "dec_heads", "patch", "max_matches", "subsample",
          "pos_embed", "head_type")}.items()))

    def step(params, key, acc):
        k0, k1, k2 = jax.random.split(key, 3)
        i0 = jax.random.uniform(k0, (B, R, R, 3), jnp.float32) * 2 - 1
        i1 = jax.random.uniform(k1, (B, R, R, 3), jnp.float32) * 2 - 1
        out = m._apply_batched(params, i0, i1, conf_key)
        ver = ransac_ops.ransac_batch(
            k2, out["keypoints0"], out["keypoints1"], out["mask"],
            model="fundamental", threshold=4.0, num_hypotheses=512)
        return (acc + out["scores"].astype(jnp.float32).sum()
                + ver["num_inliers"].astype(jnp.float32).sum())

    f, by = cost_of(step, params, jax.random.PRNGKey(0), jnp.float32(0))
    return f / B, by / B


def mast3r():
    from imcui_tpu.models.matchers import duster as dm
    from imcui_tpu.models.matchers import mast3r as m

    B, R = 1, 512
    conf = dict(dm.PUBLISHED, max_matches=2048, subsample=8,
                desc_dim=m.DESC_DIM)
    params = dm.init_params(jax.random.PRNGKey(0), conf)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    for key, k in (("downstream_head1", k1), ("downstream_head2", k2)):
        params[key]["head_local_features"] = m.init_desc_head(
            k, conf["enc_dim"], conf["dec_dim"], conf["patch"],
            conf["desc_dim"])
    conf_key = tuple(sorted(
        {k: conf[k] for k in
         ("enc_dim", "enc_depth", "enc_heads", "dec_dim", "dec_depth",
          "dec_heads", "patch", "max_matches", "subsample",
          "pos_embed", "head_type", "desc_dim")}.items()))

    def step(params, key, acc):
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (B, R, R, 3), jnp.float32) * 2 - 1
        i1 = jax.random.uniform(k1, (B, R, R, 3), jnp.float32) * 2 - 1
        out = m._apply_batched(params, i0, i1, conf_key)
        return acc + out["scores"].astype(jnp.float32).sum()

    f, by = cost_of(step, params, jax.random.PRNGKey(0), jnp.float32(0))
    return f / B, by / B


TIERS = {
    "flagship": (flagship, "flagship"),
    "loftr": (loftr, "loftr"),
    "roma": (roma, "roma"),
    "dkm": (dkm, "dkm"),
    "duster": (duster, "duster"),
    "mast3r": (mast3r, "mast3r"),
}


def main():
    which = sys.argv[1:] or list(TIERS)
    rows = []
    for name in which:
        fn, mkey = TIERS[name]
        try:
            flops, nbytes = fn()
        except Exception as e:
            print(f"{name}: FAILED {e}", flush=True)
            continue
        for prec, peak in (("bf16", PEAK_BF16_TFS), ("int8", PEAK_INT8_TFS)):
            ms = MEASURED_MS_PER_PAIR.get(f"{mkey}_{prec}")
            if ms is None:
                continue
            tfs = flops / (ms / 1e3) / 1e12
            mfu = tfs / peak
            hbm = nbytes / (ms / 1e3) / (HBM_TBS * 1e12)
            rows.append({
                "tier": name, "prec": prec,
                "gflops_per_pair": round(flops / 1e9, 1),
                "gbytes_per_pair": round(nbytes / 1e9, 2),
                "ms_per_pair": ms,
                "achieved_tfs": round(tfs, 1),
                "mfu": round(mfu, 3),
                "hbm_util": round(hbm, 3),
            })
            print(json.dumps(rows[-1]), flush=True)

    print("\n| tier | prec | GF/pair | GB/pair | ms/pair | TF/s | MFU | HBM util |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['tier']} | {r['prec']} | {r['gflops_per_pair']} "
              f"| {r['gbytes_per_pair']} | {round(r['ms_per_pair'], 1)} "
              f"| {r['achieved_tfs']} | {r['mfu']:.2f} | {r['hbm_util']:.2f} |")


if __name__ == "__main__":
    main()
