"""Re-validate every headline number with the chained-fetch harness.

Round-3 finding: ``jax.block_until_ready`` does not reliably block
through the axon tunnel (DUSt3R: 80 iters of a ~60 ms program
"completed" in 0.11 s). Every published number must be re-measured with
utils/benchmark.chain_bench, which serialises iterations through a
scalar accumulator and fetches the final value.

Usage: python tools/rebench_sync.py [flagship|loftr|roma|duster] ...
(flagship also reports the legacy block_until_ready timing for the
measurement-method delta.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imcui_tpu.utils.benchmark import chain_bench


def report(label, dt, iters, batch, extra=None):
    res = {"metric": label, "value": round(batch * iters / dt, 3),
           "unit": "pairs/s", "iters": iters, "batch": batch,
           "ms_per_pair": round(1000 * dt / (batch * iters), 2),
           "harness": "chain_fetch"}
    if extra:
        res.update(extra)
    print(json.dumps(res), flush=True)
    return res


def bench_flagship(legacy_compare=True):
    from imcui_tpu.pipeline import two_view

    BATCH, H, W, MAX_KPTS, N_LAYERS = 4, 1024, 1024, 1024, 9
    params, meta = two_view.load_pretrained(n_layers=N_LAYERS)
    valid = jnp.tile(jnp.asarray([[W, H]], jnp.int32), (BATCH, 1))

    def step(params, key, acc):
        k0, k1, k2 = jax.random.split(key, 3)
        image0 = jax.random.uniform(k0, (BATCH, 1, H, W), jnp.float32)
        image1 = jax.random.uniform(k1, (BATCH, 1, H, W), jnp.float32)
        out = two_view.match_step(
            params, image0, image1, valid, valid, k2,
            max_keypoints=MAX_KPTS, n_layers=N_LAYERS,
            num_hypotheses=512, ransac="fundamental",
        )
        return (acc + out["matching_scores0"].sum()
                + out["num_inliers"].sum())

    nms = ("xla-nms" if os.environ.get("IMCUI_DISABLE_PALLAS_NMS")
           else "pallas-nms")
    dt, val = chain_bench(step, params, iters=100, warmup=3)
    report(f"flagship SP+LG@1024 [{nms}]", dt, 100, BATCH,
           {"acc": val})

    if legacy_compare:
        jstep = jax.jit(step)
        acc0 = jnp.float32(0.0)
        for i in range(3):
            jax.block_until_ready(
                jstep(params, jax.random.PRNGKey(20_000 + i), acc0))
        t0 = time.perf_counter()
        accs = [jstep(params, jax.random.PRNGKey(i), acc0)
                for i in range(100)]
        jax.block_until_ready(accs)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"flagship SP+LG@1024 [{nms}] LEGACY-block",
            "value": round(4 * 100 / dt, 3), "unit": "pairs/s",
            "ms_per_pair": round(1000 * dt / 400, 2)}), flush=True)


def bench_loftr():
    from imcui_tpu.models.matchers import loftr

    B, H, W = 2, 480, 640
    params = loftr.init_params(jax.random.PRNGKey(0))
    conf_key = (("match_threshold", 0.2), ("max_matches", 1024),
                ("temperature", 0.1))
    wh = jnp.tile(jnp.asarray([[W, H]], jnp.int32), (B, 1))

    def step(params, key, acc):
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (B, H, W, 1), jnp.float32)
        i1 = jax.random.uniform(k1, (B, H, W, 1), jnp.float32)
        out = loftr._apply_batched(params, i0, i1, wh, wh, conf_key)
        return acc + out["scores"].astype(jnp.float32).sum()

    dt, _ = chain_bench(step, params, iters=40)
    report("pairs/s/chip LoFTR@640x480", dt, 40, B)


def _cast_bf16(params):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)


def bench_roma(batch=1):
    from imcui_tpu.models.matchers import roma

    B, R = batch, 560
    conf = {"dinov2_variant": "vitl14"}
    params = _cast_bf16(roma.init_params(jax.random.PRNGKey(0), conf))
    conf_key = (("dinov2_variant", "vitl14"),)

    def step(params, key, acc):
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (B, R, R, 3), jnp.bfloat16)
        i1 = jax.random.uniform(k1, (B, R, R, 3), jnp.bfloat16)
        out = roma._apply_batched(params, i0, i1, 2048, conf_key)
        return acc + out["scores"].astype(jnp.float32).sum()

    dt, _ = chain_bench(step, params, iters=20, warmup=2)
    report(f"pairs/s/chip RoMa(DINOv2-L+GP)@560(bf16)@B{B}", dt, 20, B)


def bench_duster(batch=1):
    from imcui_tpu.models.matchers import duster

    B, R = batch, 512
    conf = dict(duster.PUBLISHED, max_matches=2048, subsample=8)
    params = _cast_bf16(duster.init_params(jax.random.PRNGKey(0), conf))
    conf_key = tuple(sorted(
        {k: conf[k] for k in
         ("enc_dim", "enc_depth", "enc_heads", "dec_dim", "dec_depth",
          "dec_heads", "patch", "max_matches", "subsample",
          "pos_embed", "head_type")}.items()))

    def step(params, key, acc):
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (B, R, R, 3), jnp.bfloat16) * 2 - 1
        i1 = jax.random.uniform(k1, (B, R, R, 3), jnp.bfloat16) * 2 - 1
        out = duster._apply_batched(params, i0, i1, conf_key)
        # conf head: 1+exp at random init zeroes most scores — count the
        # raw confidences too so nothing upstream is elidable
        return (acc + out["scores"].astype(jnp.float32).sum()
                + out["keypoints0"].astype(jnp.float32).sum())

    dt, _ = chain_bench(step, params, iters=20, warmup=2)
    report(f"pairs/s/chip DUSt3R(ViT-L,dpt)@512(bf16)@B{B}", dt, 20, B)


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"flagship"}
    if "flagship" in which:
        bench_flagship()
    if "loftr" in which:
        bench_loftr()
    if "roma" in which:
        bench_roma()
    if "duster" in which:
        bench_duster()
