"""SphereGlue sparse matcher (spherical graph attention), native JAX.

Reference contract: imcui/hloc/matchers/sphereglue.py:46-110 — sparse
matcher consuming {keypoints, scores, descriptors} from any detector
(descriptor_dim per detector), designed for equirectangular/spherical
images: keypoints are lifted to unit-sphere 3D coordinates, a KNN graph is
built on the sphere, node embeddings run through Chebyshev graph
convolutions (filter size K) + cross attention GNN layers, and matches
come from a Sinkhorn assignment (sinkhorn_iterations, match_threshold).

TPU-first: the KNN graph is realised as a dense masked adjacency — at the
fixed padded N (≤ a few thousand) the (N, N) normalised adjacency matmul
is cheaper on the MXU than any sparse scatter, and the Chebyshev recursion
T_{k+1} = 2·L̂·T_k − T_{k−1} is k dense matmuls. Everything is one jitted
program per (N0, N1) bucket.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops.attention import mha
from ...ops.sinkhorn import log_optimal_transport, matches_from_assignment
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import init_linear, linear, relu

K_CHEB = 2
KNN = 20
N_GNN = 2
NHEAD = 4


def init_params(rng, descriptor_dim=256, output_dim=512):
    keys = jax.random.split(rng, 4 + 3 * N_GNN)
    d = output_dim
    params = {
        "embed": init_linear(keys[0], descriptor_dim + 4, d),
        "cheb": [init_linear(keys[1 + k], d, d) for k in range(K_CHEB + 1)],
        "gnn": [],
        "final_proj": init_linear(keys[3 + K_CHEB], d, d),
        "bin_score": jnp.asarray(1.0),
    }
    for i in range(N_GNN):
        k1, k2, k3 = jax.random.split(keys[4 + K_CHEB + i], 3)
        params["gnn"].append({
            "qkv": init_linear(k1, d, 3 * d),
            "merge": init_linear(k2, 2 * d, d),
            "mlp": init_linear(k3, d, d),
        })
    return params


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0),
                       descriptor_dim=conf.get("descriptor_dim", 256),
                       output_dim=conf.get("output_dim", 512))
    return load_params_auto("sphereglue/" + conf.get(
        "model_name", "sphereglue_superpoint.pth"), init, "sphereglue")


def to_sphere(kpts, size):
    """Equirectangular pixel coords → unit-sphere xyz.
    kpts: (N, 2) xy; size: (2,) (w, h)."""
    lon = (kpts[:, 0] / size[0] - 0.5) * 2 * jnp.pi
    lat = (0.5 - kpts[:, 1] / size[1]) * jnp.pi
    cl = jnp.cos(lat)
    return jnp.stack([cl * jnp.cos(lon), cl * jnp.sin(lon),
                      jnp.sin(lat)], -1)


def cheb_laplacian(xyz, mask, knn=KNN):
    """Dense masked KNN graph on the sphere → scaled Laplacian L̂ (N, N)."""
    n = xyz.shape[0]
    dots = xyz @ xyz.T  # cos(angle): larger = closer
    dots = jnp.where(mask[:, None] & mask[None, :], dots, -2.0)
    dots = dots - 3.0 * jnp.eye(n)  # exclude self
    k = min(knn, n - 1)
    kth = jax.lax.top_k(dots, k)[0][:, -1]
    adj = (dots >= kth[:, None]) & (dots > -1.5)
    adj = (adj | adj.T).astype(jnp.float32)
    deg = jnp.maximum(adj.sum(-1), 1.0)
    dinv = jax.lax.rsqrt(deg)
    lap = jnp.eye(n) - dinv[:, None] * adj * dinv[None, :]
    return lap - jnp.eye(n)  # scaled: L − I (spectrum ≈ [−1, 1])


def chebyshev(params, x, lhat):
    """Chebyshev graph convolution of order K_CHEB."""
    t_prev = x
    t_cur = lhat @ x
    out = linear(params["cheb"][0], t_prev) + linear(params["cheb"][1],
                                                     t_cur)
    for k in range(2, K_CHEB + 1):
        t_next = 2.0 * (lhat @ t_cur) - t_prev
        out = out + linear(params["cheb"][k], t_next)
        t_prev, t_cur = t_cur, t_next
    return relu(out)


def cross_gnn(p, x, source, mask_src):
    d = x.shape[-1]
    dh = d // NHEAD
    qkv_x = linear(p["qkv"], x)
    qkv_s = linear(p["qkv"], source)
    q = qkv_x[:, :d].reshape(-1, NHEAD, dh).transpose(1, 0, 2)
    k = qkv_s[:, d:2 * d].reshape(-1, NHEAD, dh).transpose(1, 0, 2)
    v = qkv_s[:, 2 * d:].reshape(-1, NHEAD, dh).transpose(1, 0, 2)
    msg = mha(q, k, v, mask_k=mask_src).transpose(1, 0, 2).reshape(-1, d)
    return x + linear(p["mlp"], relu(linear(
        p["merge"], jnp.concatenate([x, msg], -1))))


def forward(params, kpts0, kpts1, scores0, scores1, desc0, desc1,
            mask0, mask1, size0, size1, conf):
    x0 = to_sphere(kpts0, size0)
    x1 = to_sphere(kpts1, size1)
    f0 = linear(params["embed"], jnp.concatenate(
        [desc0, x0, scores0[:, None]], -1))
    f1 = linear(params["embed"], jnp.concatenate(
        [desc1, x1, scores1[:, None]], -1))
    l0 = cheb_laplacian(x0, mask0)
    l1 = cheb_laplacian(x1, mask1)
    f0 = chebyshev(params, f0, l0)
    f1 = chebyshev(params, f1, l1)
    for p in params["gnn"]:  # reference GNN_layers = ["cross"]
        f0n = cross_gnn(p, f0, f1, mask1)
        f1 = cross_gnn(p, f1, f0, mask0)
        f0 = f0n
    f0 = linear(params["final_proj"], f0)
    f1 = linear(params["final_proj"], f1)

    d = f0.shape[-1]
    sim = (f0 @ f1.T) / d ** 0.25
    assignment = log_optimal_transport(
        sim, params["bin_score"], conf.get("sinkhorn_iterations", 20),
        mask0=mask0, mask1=mask1)
    return matches_from_assignment(
        assignment, conf.get("match_threshold", 0.2), mask0=mask0,
        mask1=mask1)


@functools.partial(jax.jit, static_argnames=("conf_key",))
def _apply_batched(params, kpts0, kpts1, s0, s1, d0, d1, m0, m1,
                   size0, size1, conf_key):
    conf = dict(conf_key)
    matches0, ms0 = jax.vmap(
        lambda a, b, c, d, e, f, g, h, i, j: forward(
            params, a, b, c, d, e, f, g, h, i, j, conf)
    )(kpts0, kpts1, s0, s1, d0, d1, m0, m1, size0, size1)
    return {"matches0": matches0, "matching_scores0": ms0}


class SphereGlue(BaseModel):
    """Reference contract: imcui/hloc/matchers/sphereglue.py:46."""

    default_conf = {
        "match_threshold": 0.2,
        "sinkhorn_iterations": 20,
        "max_kpts": 20000,
        "knn": 20,
        "K": 2,
        "GNN_layers": ["cross"],
        "aggr": "add",
        "descriptor_dim": 256,
        "output_dim": 512,
        "model_name": "sphereglue_superpoint.pth",
    }
    required_inputs = ["image0", "keypoints0", "scores0", "descriptors0",
                       "image1", "keypoints1", "scores1", "descriptors1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        self._conf_key = tuple(sorted({
            "match_threshold": float(conf["match_threshold"]),
            "sinkhorn_iterations": int(conf["sinkhorn_iterations"]),
        }.items()))

    def _forward(self, data):
        kpts0 = jnp.asarray(data["keypoints0"], jnp.float32)
        kpts1 = jnp.asarray(data["keypoints1"], jnp.float32)
        desc0 = jnp.asarray(data["descriptors0"], jnp.float32)
        desc1 = jnp.asarray(data["descriptors1"], jnp.float32)
        if desc0.shape[1] != kpts0.shape[1]:
            desc0 = desc0.transpose(0, 2, 1)
        if desc1.shape[1] != kpts1.shape[1]:
            desc1 = desc1.transpose(0, 2, 1)
        scores0 = jnp.asarray(data["scores0"], jnp.float32)
        scores1 = jnp.asarray(data["scores1"], jnp.float32)
        b, n0 = kpts0.shape[:2]
        n1 = kpts1.shape[1]
        mask0 = jnp.asarray(data.get("mask0", jnp.ones((b, n0), bool)),
                            bool)
        mask1 = jnp.asarray(data.get("mask1", jnp.ones((b, n1), bool)),
                            bool)

        def sizes(key_img, key_wh, kpts):
            if key_wh in data:
                return jnp.asarray(data[key_wh], jnp.float32)
            img = data.get(key_img)
            if img is not None and hasattr(img, "shape") \
                    and len(img.shape) == 4:
                h, w = img.shape[-2:]
                return jnp.tile(jnp.asarray([[w, h]], jnp.float32),
                                (b, 1))
            return jnp.max(kpts, axis=1) + 1.0

        return _apply_batched(
            self.params, kpts0, kpts1, scores0, scores1, desc0, desc1,
            mask0, mask1, sizes("image0", "size0", kpts0),
            sizes("image1", "size1", kpts1), self._conf_key)
