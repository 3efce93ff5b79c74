"""In-situ postproc ablation: full apply vs apply-with-stages-removed."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from imcui_tpu.models.extractors import superpoint as sp
from imcui_tpu.ops import nms as nms_ops

B, H, W, N = 8, 1024, 1024, 1024
ITERS = 20
params = sp.init_params(jax.random.PRNGKey(0))
bp = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
valid = jnp.tile(jnp.asarray([[W, H]], jnp.int32), (B, 1))

def timed(f):
    jax.block_until_ready(f(0))
    t0 = time.perf_counter()
    jax.block_until_ready([f(1 + i) for i in range(ITERS)])
    return (time.perf_counter() - t0) / ITERS * 1e3

def gen(i):
    return jax.random.uniform(jax.random.PRNGKey(i), (B, H, W, 1),
                              jnp.float32).astype(jnp.bfloat16)
cal = timed(jax.jit(lambda i: gen(i).astype(jnp.float32).sum()))

def variant(stop):
    @jax.jit
    def f(i):
        x = gen(i)
        feats = sp.backbone(bp, x)
        heat = sp.dense_scores(bp, feats).astype(jnp.bfloat16)
        heat = jax.lax.optimization_barrier(heat)
        dmap = sp.dense_descriptors(bp, feats)
        if stop == "base":
            return heat.astype(jnp.float32).sum() + dmap.sum()
        def per_image(scores, dm, vwh):
            scores = nms_ops.simple_nms(scores, 4)
            scores = scores * nms_ops.border_mask(
                H, W, 4, valid_wh=vwh, dtype=scores.dtype)
            if stop == "nms":
                return scores.astype(jnp.float32).sum(), dm.sum()
            kpts, ks, mask = nms_ops.select_topk_keypoints(
                scores, N, 0.0005)
            if stop == "topk":
                return kpts.sum() + ks.astype(jnp.float32).sum(), dm.sum()
            desc = nms_ops.sample_descriptors(kpts, dm.transpose(2, 0, 1),
                                              s=8)
            return kpts.sum() + desc.sum(), dm.sum() * 0
        a, b2 = jax.vmap(per_image)(heat, dmap, valid)
        return a.sum() + b2.sum()
    return f

for stop in ("base", "nms", "topk", "full"):
    t = timed(variant(stop)) - cal
    print(f"{stop:6s}: {t:7.2f} ms", flush=True)
