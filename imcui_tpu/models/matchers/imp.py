"""IMP sparse matcher (iterative matching and pose estimation), native JAX.

Reference contract: imcui/hloc/matchers/imp.py:15-51 — sparse matcher
(GML: graph matching layers) over {keypoints, scores, descriptors}
(default features: sfd2), ``produce_matches(p=0.2)`` with sinkhorn
iterations. The published design couples matching and relative pose:
attention GNN layers alternate with a differentiable weighted 8-point
pose estimate from the current soft assignment; the epipolar residuals of
the estimated pose re-weight subsequent cross-attention (geometry prunes
appearance ambiguity), iterating matching → pose → matching.

TPU-first: the weighted 8-point solve is a fixed-shape (N, 9) design
matrix eigen-solve (via one SVD of a 9×9 normal matrix — no dynamic
inlier sets); the epipolar gate enters cross-attention as an additive
-Sampson bias, so the iteration is jit-compatible end to end.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops.attention import mha
from ...ops.ransac import highest_precision
from ...ops.sinkhorn import log_optimal_transport, matches_from_assignment
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import init_linear, linear, relu

D_MODEL = 256
N_LAYERS = 6
POSE_AT = (2, 4)  # run the pose iteration after these cross layers
NHEAD = 4


def init_params(rng, descriptor_dim=128):
    keys = jax.random.split(rng, 3 + 2 * N_LAYERS)
    params = {
        "kenc": {"0": init_linear(keys[0], 3, 64),
                 "1": init_linear(keys[1], 64, D_MODEL)},
        "denc": init_linear(keys[2], descriptor_dim, D_MODEL),
        "layers": [],
        "bin_score": jnp.asarray(1.0),
        "epi_scale": jnp.asarray(1.0),
    }
    for i in range(N_LAYERS):
        k1, k2 = jax.random.split(keys[3 + i], 2)
        params["layers"].append({
            "qkv": init_linear(k1, D_MODEL, 3 * D_MODEL),
            "mlp": {"0": init_linear(jax.random.fold_in(k2, 0),
                                     2 * D_MODEL, 2 * D_MODEL),
                    "2": init_linear(jax.random.fold_in(k2, 1),
                                     2 * D_MODEL, D_MODEL)},
        })
    return params


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("pram/" + conf.get("model_name",
                                           "imp_gml.920.pth"), init, "imp")


@highest_precision
def weighted_eight_point(p0, p1, w):
    """Weighted 8-point fundamental estimate from ALL correspondences.
    p0/p1: (N, 2) normalised coords; w: (N,) soft weights. Returns F."""
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    a = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1,
                   x0, y0, jnp.ones_like(x0)], -1)  # (N, 9)
    ata = (a * w[:, None]).T @ a  # (9, 9)
    # smallest eigenvector of the weighted normal matrix
    _, vecs = jnp.linalg.eigh(ata)
    return vecs[:, 0].reshape(3, 3)


def sampson(f, p0, p1):
    """Sampson distance of correspondences under F. p*: (N, 2)."""
    ones = jnp.ones((p0.shape[0], 1), p0.dtype)
    h0 = jnp.concatenate([p0, ones], -1)
    h1 = jnp.concatenate([p1, ones], -1)
    fx0 = h0 @ f.T          # (N, 3) = F·x0
    ftx1 = h1 @ f            # (N, 3) = Fᵀ·x1
    num = jnp.sum(h1 * fx0, -1) ** 2
    den = fx0[:, 0] ** 2 + fx0[:, 1] ** 2 + ftx1[:, 0] ** 2 \
        + ftx1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-9)


def attn_layer(p, x, source, mask_src, bias=None):
    d = x.shape[-1]
    dh = d // NHEAD
    q = linear(p["qkv"], x)[:, :d].reshape(-1, NHEAD, dh).transpose(
        1, 0, 2)
    kv = linear(p["qkv"], source)
    k = kv[:, d:2 * d].reshape(-1, NHEAD, dh).transpose(1, 0, 2)
    v = kv[:, 2 * d:].reshape(-1, NHEAD, dh).transpose(1, 0, 2)
    msg = mha(q, k, v, mask_k=mask_src, bias=bias)
    msg = msg.transpose(1, 0, 2).reshape(-1, d)
    return x + linear(p["mlp"]["2"], relu(linear(
        p["mlp"]["0"], jnp.concatenate([x, msg], -1))))


def forward(params, kpts0, kpts1, scores0, scores1, desc0, desc1,
            mask0, mask1, size0, size1, conf):
    n0 = kpts0.shape[0]
    p0n = (kpts0 - size0 / 2) / size0.max()
    p1n = (kpts1 - size1 / 2) / size1.max()

    def enc(pn, s, d):
        k = linear(params["kenc"]["1"], relu(linear(
            params["kenc"]["0"],
            jnp.concatenate([pn, s[:, None]], -1))))
        return k + linear(params["denc"], d)

    f0 = enc(p0n, scores0, desc0)
    f1 = enc(p1n, scores1, desc1)

    epi_bias01 = None
    epi_bias10 = None
    for i, layer in enumerate(params["layers"]):
        if i % 2 == 0:  # self
            f0 = attn_layer(layer, f0, f0, mask0)
            f1 = attn_layer(layer, f1, f1, mask1)
        else:  # cross, with the current epipolar gate
            f0n = attn_layer(layer, f0, f1, mask1, bias=epi_bias01)
            f1 = attn_layer(layer, f1, f0, mask0, bias=epi_bias10)
            f0 = f0n
        if i in POSE_AT:
            # soft assignment → weighted 8-point → Sampson gate
            sim = (f0 @ f1.T) / D_MODEL ** 0.5
            sim = jnp.where(mask0[:, None] & mask1[None, :], sim, -1e9)
            p01 = jax.nn.softmax(sim, 1)
            w = jnp.max(p01, 1) * mask0
            tgt = p01 @ p1n  # expected correspondence of every kpt0
            fmat = weighted_eight_point(p0n, tgt, w)
            # pairwise Sampson distances of all candidate pairs
            d01 = jax.vmap(
                lambda q: sampson(fmat, jnp.broadcast_to(q, p1n.shape),
                                  p1n))(p0n)  # (N0, N1)
            gate = -params["epi_scale"] * jnp.sqrt(d01 + 1e-9)
            epi_bias01 = gate[None]   # (1, N0, N1) broadcast over heads
            epi_bias10 = gate.T[None]

    sim = (f0 @ f1.T) / D_MODEL ** 0.25
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


class IMP(BaseModel):
    """Reference contract: imcui/hloc/matchers/imp.py:15."""

    default_conf = {
        "match_threshold": 0.2,
        "features": "sfd2",
        "model_name": "imp_gml.920.pth",
        "sinkhorn_iterations": 20,
    }
    required_inputs = ["image0", "keypoints0", "scores0", "descriptors0",
                       "image1", "keypoints1", "scores1", "descriptors1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        self._conf_key = tuple(sorted({
            "match_threshold": float(conf["match_threshold"]),
            "sinkhorn_iterations": int(conf["sinkhorn_iterations"]),
        }.items()))
        self._proj = {}

    def _forward(self, data):
        kpts0 = jnp.asarray(data["keypoints0"], jnp.float32)
        kpts1 = jnp.asarray(data["keypoints1"], jnp.float32)
        desc0 = jnp.asarray(data["descriptors0"], jnp.float32)
        desc1 = jnp.asarray(data["descriptors1"], jnp.float32)
        if desc0.shape[1] != kpts0.shape[1]:
            desc0 = desc0.transpose(0, 2, 1)
        if desc1.shape[1] != kpts1.shape[1]:
            desc1 = desc1.transpose(0, 2, 1)
        # the GML encoder is 128-d (sfd2); fold other dims with a fixed
        # random projection so any detector plugs in
        dd = desc0.shape[-1]
        if dd != 128:
            if dd not in self._proj:
                self._proj[dd] = jax.random.normal(
                    jax.random.PRNGKey(7), (dd, 128)) / dd ** 0.5
            desc0 = desc0 @ self._proj[dd]
            desc1 = desc1 @ self._proj[dd]
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
