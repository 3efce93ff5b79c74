"""DUSt3R whole-program stage attribution (round 4).

The axon tunnel's ~2.4 ms/program dispatch floor makes isolated slice
micro-benches unresolvable (BASELINE.md "refiner-pyramid micro-probe"),
so this tool attributes cost by differencing FULL programs: each
variant runs the real pipeline truncated at a stage boundary, with all
live outputs folded into the chained accumulator so XLA cannot DCE the
measured work. Differences between consecutive variants resolve
multi-ms stage costs with in-graph fusion intact.

Variants (all B=1, 512x512x3 bf16 params + inputs, published ViT-L conf):
  enc      : encode view0 + view1 (patch embed + 24-block scan + norm)
  dec      : + dual 12-block CroCo decoder (hooks summed)
  dpt      : + both DPT pointmap heads (pts/conf summed)
  nn       : + reciprocal 3-D NN (scores summed)      == forward_pair
  ransac   : + 512-hyp fundamental RANSAC             == bench_heavy row

Usage: python tools/profile_duster_stages.py [enc dec dpt nn ransac]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imcui_tpu.utils.benchmark import chain_bench

B, R = 1, 512


def _tree_sum(t):
    leaves = [x.astype(jnp.float32).sum() for x in jax.tree_util.tree_leaves(t)]
    return sum(leaves[1:], leaves[0])


def main(stages):
    from imcui_tpu.models.matchers import duster
    from imcui_tpu.ops import ransac as ransac_ops

    conf = dict(duster.PUBLISHED, max_matches=2048, subsample=8)
    params = duster.init_params(jax.random.PRNGKey(0), conf)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    def inputs(key):
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (R, R, 3), jnp.bfloat16) * 2 - 1
        i1 = jax.random.uniform(k1, (R, R, 3), jnp.bfloat16) * 2 - 1
        return i0, i1

    def upto_enc(params, key, acc):
        i0, i1 = inputs(key)
        t0, _ = duster.encode(params, i0, conf)
        t1, _ = duster.encode(params, i1, conf)
        return acc + _tree_sum((t0, t1))

    def upto_dec(params, key, acc):
        i0, i1 = inputs(key)
        t0, grid = duster.encode(params, i0, conf)
        t1, _ = duster.encode(params, i1, conf)
        h0, h1 = duster.decode(params, t0, t1, grid, conf)
        return acc + _tree_sum((h0, h1))

    def upto_dpt(params, key, acc):
        i0, i1 = inputs(key)
        t0, grid = duster.encode(params, i0, conf)
        t1, _ = duster.encode(params, i1, conf)
        h0, h1 = duster.decode(params, t0, t1, grid, conf)
        pts0, c0 = duster.head_to_pointmap(
            params["downstream_head1"], h0, grid, conf["patch"])
        pts1, c1 = duster.head_to_pointmap(
            params["downstream_head2"], h1, grid, conf["patch"])
        return acc + _tree_sum((pts0, c0, pts1, c1))

    def upto_nn(params, key, acc):
        i0, i1 = inputs(key)
        out = duster.forward_pair(params, i0, i1, conf)
        return acc + out["scores"].astype(jnp.float32).sum()

    def upto_ransac(params, key, acc):
        i0, i1 = inputs(key)
        out = duster.forward_pair(params, i0, i1, conf)
        ver = ransac_ops.ransac_batch(
            jax.random.fold_in(key, 7),
            out["keypoints0"][None], out["keypoints1"][None],
            out["mask"][None],
            model="fundamental", threshold=4.0, num_hypotheses=512)
        return (acc + out["scores"].astype(jnp.float32).sum()
                + ver["num_inliers"].astype(jnp.float32).sum())

    fns = {"enc": upto_enc, "dec": upto_dec, "dpt": upto_dpt,
           "nn": upto_nn, "ransac": upto_ransac}
    results = {}
    for name in stages:
        dt, _ = chain_bench(fns[name], params, iters=20, warmup=2,
                            key_base=hash(name) % 1000)
        results[name] = round(1000 * dt / 20, 2)
        print(json.dumps({"stage": name, "ms": results[name]}), flush=True)
    print(json.dumps({"profile": results}), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or ["enc", "dec", "dpt", "nn", "ransac"]
    main(args)
