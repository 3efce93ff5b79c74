"""Adaptive-depth LightGlue on the real chip: correctness + wall-clock
at a saturated vs unsaturated confidence head (B=4, N=1024, 9 layers)."""
import sys, time
sys.path.insert(0, "/root/repo")
import functools
import jax, jax.numpy as jnp
from imcui_tpu.models.matchers import lightglue as lg

B, N, L = 4, 1024, 9
conf = {"features": "superpoint", "descriptor_dim": 256, "num_heads": 4,
        "n_layers": L, "add_scale_ori": False, "match_threshold": 0.1,
        "precision": "fp32", "depth_confidence": 0.95}
params = lg.init_params(jax.random.PRNGKey(0), conf)

def gen(i):
    ks = jax.random.split(jax.random.PRNGKey(i), 4)
    kp0 = jax.random.uniform(ks[0], (B, N, 2)) * 1024
    kp1 = jax.random.uniform(ks[1], (B, N, 2)) * 1024
    d0 = jax.random.normal(ks[2], (B, N, 256))
    d1 = jax.random.normal(ks[3], (B, N, 256))
    return kp0, kp1, d0, d1

mask = jnp.ones((B, N), bool)
wh = jnp.tile(jnp.asarray([[1024.0, 1024.0]]), (B, 1))

def run(params, i):
    kp0, kp1, d0, d1 = gen(i)
    fn = functools.partial(lg.forward_pair_adaptive, conf=conf)
    out = jax.vmap(lambda a, b, c, d, e, f, g, h: fn(
        params, a, b, c, d, e, f, g, h))(
        kp0, kp1, d0, d1, mask, mask, wh, wh)
    return out["matching_scores0"].sum(), out["stop_layer"]

g = jax.jit(run)
s, sl = jax.block_until_ready(g(params, 0))
print("random weights stop_layer:", sl, flush=True)
t0 = time.time()
jax.block_until_ready([g(params, 1 + i)[0] for i in range(20)])
print("full-depth adaptive: %.2f ms" % ((time.time() - t0) / 20 * 1e3), flush=True)

# saturate confidence head 2 -> exit after layer 3
p2 = jax.tree_util.tree_map(lambda x: x, params)
p2["token_confidence"] = [dict(t) for t in params["token_confidence"]]
t2 = dict(p2["token_confidence"][2])
t2["token"] = {"w": params["token_confidence"][2]["token"]["w"] * 0,
               "b": params["token_confidence"][2]["token"]["b"] * 0 + 10.0}
p2["token_confidence"][2] = t2
s, sl = jax.block_until_ready(g(p2, 0))
print("saturated@2 stop_layer:", sl, flush=True)
t0 = time.time()
jax.block_until_ready([g(p2, 1 + i)[0] for i in range(20)])
print("early-exit adaptive: %.2f ms" % ((time.time() - t0) / 20 * 1e3), flush=True)
