"""End-to-end stage profile of the fused two-view step at the bench
operating point (B=4, 1024px, 1024 kpts, 9 layers). Axon rules: on-device
input gen, distinct per iter, scalar blocked at the end."""
import sys, time
sys.path.insert(0, "/root/repo")
import functools
import jax, jax.numpy as jnp
from imcui_tpu.pipeline import two_view
from imcui_tpu.models.extractors import superpoint as sp
from imcui_tpu.models.matchers import lightglue as lg
from imcui_tpu.ops import ransac as ransac_ops

B, H, W, N, L = 4, 1024, 1024, 1024, 9
ITERS = 30
params = two_view.init_params(n_layers=L)
valid = jnp.tile(jnp.asarray([[W, H]], jnp.int32), (B, 1))

def timed(f):
    jax.block_until_ready(f(0))
    t0 = time.perf_counter()
    jax.block_until_ready([f(1 + i) for i in range(ITERS)])
    return (time.perf_counter() - t0) / ITERS * 1e3

def gen_images(i):
    k0, k1 = jax.random.split(jax.random.PRNGKey(i))
    return (jax.random.uniform(k0, (2 * B, 1, H, W), jnp.float32))

gen_cal = timed(jax.jit(lambda i: gen_images(i).sum()))

@jax.jit
def sp_only(i):
    imgs = gen_images(i)
    v = jnp.concatenate([valid, valid], 0)
    f = sp.apply(params["superpoint"], imgs, v, max_keypoints=N,
                 keypoint_threshold=0.0005, precision="bf16")
    return f["keypoints"].sum() + f["descriptors"].astype(jnp.float32).sum()

t_sp = timed(sp_only) - gen_cal
print(f"superpoint x{2*B} imgs : {t_sp:7.2f} ms", flush=True)

# LightGlue alone: generate fake features on device
lg_conf = {"num_heads": 4, "match_threshold": 0.1, "add_scale_ori": False,
           "features": "superpoint", "precision": "fp32"}
def gen_feats(i):
    ks = jax.random.split(jax.random.PRNGKey(i), 4)
    kp = jax.random.uniform(ks[0], (B, N, 2)) * 1024
    kp2 = jax.random.uniform(ks[1], (B, N, 2)) * 1024
    d0 = jax.random.normal(ks[2], (B, N, 256))
    d1 = jax.random.normal(ks[3], (B, N, 256))
    return kp, kp2, d0, d1

gen_feat_cal = timed(jax.jit(lambda i: sum(x.sum() for x in gen_feats(i))))

@jax.jit
def lg_only(i):
    kp0, kp1, d0, d1 = gen_feats(i)
    m = jnp.ones((B, N), bool)
    wh = valid.astype(jnp.float32)
    matcher = functools.partial(lg.forward_pair, conf=lg_conf)
    out = jax.vmap(lambda a, b2, c, d, e, f2, g, h2: matcher(
        params["lightglue"], a, b2, c, d, e, f2, g, h2))(
        kp0, kp1, d0, d1, m, m, wh, wh)
    return out["matching_scores0"].sum()

t_lg = timed(lg_only) - gen_feat_cal
print(f"lightglue 9L x{B} pairs: {t_lg:7.2f} ms", flush=True)

@jax.jit
def ransac_only(i):
    kp0, kp1, _, _ = gen_feats(i)
    val = jnp.ones((B, N), bool)
    keys = jax.random.split(jax.random.PRNGKey(i + 7), B)
    ver = jax.vmap(functools.partial(
        ransac_ops.ransac, model="fundamental", threshold=4.0,
        num_hypotheses=512))(keys, kp0, kp1, val)
    return ver["num_inliers"].sum()

t_r = timed(ransac_only) - gen_feat_cal
print(f"ransac 512h x{B}      : {t_r:7.2f} ms", flush=True)

@jax.jit
def full(i):
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(i), 3)
    image0 = jax.random.uniform(k0, (B, 1, H, W), jnp.float32)
    image1 = jax.random.uniform(k1, (B, 1, H, W), jnp.float32)
    out = two_view.match_step(params, image0, image1, valid, valid, k2,
                              max_keypoints=N, n_layers=L,
                              num_hypotheses=512, ransac="fundamental")
    return out["matching_scores0"].sum() + out["num_inliers"].sum()

t_full = timed(full) - gen_cal
print(f"full step x{B} pairs  : {t_full:7.2f} ms -> {B/(t_full/1e3):.1f} pairs/s", flush=True)
