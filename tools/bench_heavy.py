"""Heavy-tier benchmarks — BASELINE.md configs 3/4/5 (VERDICT r2 #3).

Measures pairs/s/chip on the real TPU for:
  3. LoFTR dense 640×480 (re-bench post padding/align-corners fixes)
  4. RoMa published architecture: DINOv2 ViT-L/14 @ 560² + GP + anchor
     decoder + 5-scale ConvRefiners
  5. DUSt3R ViT-L/16 @ 512² dual CroCo decoder + DPT pointmap heads +
     reciprocal 3-D NN

Measurement rules (BASELINE.md "Measurement hazards"): inputs generated
ON DEVICE per iteration from distinct PRNG keys, iterations chained
through a scalar accumulator, final value fetched to host
(utils/benchmark.chain_bench). Random weights — shape-bound throughput.

Usage: python tools/bench_heavy.py [loftr|roma|duster|dkm|mast3r|all] [--bf16|--int8]
Writes one JSON line per config (appends to BASELINE_heavy.jsonl).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imcui_tpu.utils.benchmark import chain_bench


def _bench(step, params, iters, warmup, batch, label, extra=None):
    # params MUST be a jit argument, not a closure: closed-over trees
    # inline as HLO literals through the nested jit (a ViT-L's 600 MB of
    # weights made the compile payload exceed the axon tunnel's upload
    # limit — HTTP 413). step signature: (params, key, acc) -> acc;
    # chain_bench serialises iterations through the accumulator and
    # fetches the final value (block_until_ready lies on some graphs —
    # the original DUSt3R row here read 485 pairs/s, 17x reality).
    dt, _ = chain_bench(step, params, iters, warmup)
    res = {"metric": label, "value": round(batch * iters / dt, 3),
           "unit": "pairs/s", "iters": iters, "batch": batch,
           "ms_per_pair": round(1000 * dt / (batch * iters), 2)}
    if extra:
        res.update(extra)
    line = json.dumps(res)
    print(line, flush=True)
    with open("BASELINE_heavy.jsonl", "a") as f:
        f.write(line + "\n")


def _apply_prec(params, prec):
    # prec: None (f32), "bf16", or "int8" (W8A8 — layers.apply_precision
    # quantises the wide projections and bf16-casts the rest)
    from imcui_tpu.models.layers import apply_precision
    return apply_precision(params, prec)


def bench_loftr(prec=None):
    from imcui_tpu.models.matchers import loftr

    B, H, W = 2, 480, 640
    params = loftr.init_params(jax.random.PRNGKey(0))
    params = _apply_prec(params, prec)
    conf_key = (("match_threshold", 0.2), ("max_matches", 1024),
                ("temperature", 0.1))
    wh = jnp.tile(jnp.asarray([[W, H]], jnp.int32), (B, 1))

    def step(params, key, acc):
        k0, k1 = jax.random.split(key)
        dt = jnp.bfloat16 if prec else jnp.float32
        i0 = jax.random.uniform(k0, (B, H, W, 1), dt)
        i1 = jax.random.uniform(k1, (B, H, W, 1), dt)
        out = loftr._apply_batched(params, i0, i1, wh, wh, conf_key)
        return acc + out["scores"].astype(jnp.float32).sum()

    _bench(step, params, 40, 3, B, f"pairs/s/chip LoFTR@640x480"
           + (f"({prec})" if prec else ""))


def bench_eloftr(prec=None):
    from imcui_tpu.models.matchers import eloftr

    B, H, W = 2, 480, 640
    params = eloftr.init_params(jax.random.PRNGKey(0))
    params = _apply_prec(params, prec)
    conf_key = (("match_threshold", 0.2), ("max_matches", 1024),
                ("temperature", 0.1))
    wh = jnp.tile(jnp.asarray([[W, H]], jnp.int32), (B, 1))

    def step(params, key, acc):
        k0, k1 = jax.random.split(key)
        dt = jnp.bfloat16 if prec else jnp.float32
        i0 = jax.random.uniform(k0, (B, H, W, 1), dt)
        i1 = jax.random.uniform(k1, (B, H, W, 1), dt)
        out = eloftr._apply_batched(params, i0, i1, wh, wh, conf_key)
        return acc + out["scores"].astype(jnp.float32).sum()

    _bench(step, params, 40, 3, B, f"pairs/s/chip ELoFTR@640x480"
           + (f"({prec})" if prec else ""))


def bench_roma(prec=None, batch=1):
    from imcui_tpu.models.matchers import roma

    B, R = batch, 560
    conf = {"dinov2_variant": "vitl14"}
    params = roma.init_params(jax.random.PRNGKey(0), conf)
    params = _apply_prec(params, prec)
    conf_key = (("dinov2_variant", "vitl14"),)

    def step(params, key, acc):
        k0, k1 = jax.random.split(key)
        dt = jnp.bfloat16 if prec else jnp.float32
        i0 = jax.random.uniform(k0, (B, R, R, 3), dt)
        i1 = jax.random.uniform(k1, (B, R, R, 3), dt)
        out = roma._apply_batched(params, i0, i1, 2048, conf_key)
        return acc + out["scores"].astype(jnp.float32).sum()

    _bench(step, params, 20, 2, B,
           "pairs/s/chip RoMa(DINOv2-L+GP)@560"
           + (f"({prec})" if prec else "") + f"@B{B}")


def bench_duster(prec=None, batch=1):
    from imcui_tpu.models.matchers import duster

    B, R = batch, 512
    conf = dict(duster.PUBLISHED, max_matches=2048, subsample=8)
    params = duster.init_params(jax.random.PRNGKey(0), conf)
    params = _apply_prec(params, prec)
    conf_key = tuple(sorted(
        {k: conf[k] for k in
         ("enc_dim", "enc_depth", "enc_heads", "dec_dim", "dec_depth",
          "dec_heads", "patch", "max_matches", "subsample",
          "pos_embed", "head_type")}.items()))

    from imcui_tpu.ops import ransac as ransac_ops

    def step(params, key, acc):
        k0, k1, k2 = jax.random.split(key, 3)
        dt = jnp.bfloat16 if prec else jnp.float32
        i0 = jax.random.uniform(k0, (B, R, R, 3), dt) * 2 - 1
        i1 = jax.random.uniform(k1, (B, R, R, 3), dt) * 2 - 1
        out = duster._apply_batched(params, i0, i1, conf_key)
        # BASELINE config 5 is pointmap matching + batched RANSAC pose:
        # 512-hypothesis fundamental verification on the mutual-NN set
        ver = ransac_ops.ransac_batch(
            k2, out["keypoints0"], out["keypoints1"], out["mask"],
            model="fundamental", threshold=4.0, num_hypotheses=512)
        return (acc + out["scores"].astype(jnp.float32).sum()
                + ver["num_inliers"].astype(jnp.float32).sum())

    _bench(step, params, 20, 2, B,
           "pairs/s/chip DUSt3R(ViT-L,dpt)@512+ransac"
           + (f"({prec})" if prec else "") + f"@B{B}")


def bench_dkm(prec=None, batch=1):
    """DKMv3 at 544×736 (the closest 32-divisible grid to the published
    540×720 operating point)."""
    from imcui_tpu.models.matchers import dkm
    from imcui_tpu.models.matchers import roma as roma_mod

    B, H, W = batch, 544, 736
    params = dkm.init_params(jax.random.PRNGKey(0))
    params = _apply_prec(params, prec)

    def step(params, key, acc):
        k0, k1 = jax.random.split(key)
        dt = jnp.bfloat16 if prec else jnp.float32
        i0 = jax.random.uniform(k0, (B, H, W, 3), dt)
        i1 = jax.random.uniform(k1, (B, H, W, 3), dt)
        out = dkm._apply_batched(params, i0, i1, 2048)
        return acc + out["scores"].astype(jnp.float32).sum()

    _bench(step, params, 20, 2, B,
           "pairs/s/chip DKMv3(ResNet50+GP)@544x736"
           + (f"({prec})" if prec else "") + f"@B{B}")


def bench_mast3r(prec=None, batch=1):
    """MASt3R: DUSt3R trunk + pixel-shuffle descriptor heads +
    descriptor reciprocal NN at 512²."""
    from imcui_tpu.models.matchers import duster, mast3r

    B, R = batch, 512
    conf = dict(duster.PUBLISHED, max_matches=2048, subsample=8,
                desc_dim=mast3r.DESC_DIM)
    params = duster.init_params(jax.random.PRNGKey(0), conf)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    for key, k in (("downstream_head1", k1), ("downstream_head2", k2)):
        params[key]["head_local_features"] = mast3r.init_desc_head(
            k, conf["enc_dim"], conf["dec_dim"], conf["patch"],
            conf["desc_dim"])
    params = _apply_prec(params, prec)
    conf_key = tuple(sorted(
        {k: conf[k] for k in
         ("enc_dim", "enc_depth", "enc_heads", "dec_dim", "dec_depth",
          "dec_heads", "patch", "max_matches", "subsample",
          "pos_embed", "head_type", "desc_dim")}.items()))

    def step(params, key, acc):
        k0, k1 = jax.random.split(key)
        dt = jnp.bfloat16 if prec else jnp.float32
        i0 = jax.random.uniform(k0, (B, R, R, 3), dt) * 2 - 1
        i1 = jax.random.uniform(k1, (B, R, R, 3), dt) * 2 - 1
        out = mast3r._apply_batched(params, i0, i1, conf_key)
        return acc + out["scores"].astype(jnp.float32).sum()

    _bench(step, params, 20, 2, B,
           "pairs/s/chip MASt3R(ViT-L,desc)@512"
           + (f"({prec})" if prec else "") + f"@B{B}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    prec = ("int8" if "--int8" in sys.argv
            else "bf16" if "--bf16" in sys.argv else None)
    batch = 1
    for a in sys.argv:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
    if which in ("loftr", "all"):
        bench_loftr(prec)
    if which in ("eloftr", "all"):
        bench_eloftr(prec)
    if which in ("roma", "all"):
        bench_roma(prec, batch)
    if which in ("duster", "all"):
        bench_duster(prec, batch)
    if which in ("dkm", "all"):
        bench_dkm(prec, batch)
    if which in ("mast3r", "all"):
        bench_mast3r(prec, batch)
