"""MicKey matcher (metric keypoints with relative pose), native JAX.

Reference contract: imcui/hloc/matchers/mickey.py:15-50 — standalone
matcher {image0, image1}; the reference net regresses metric 3D keypoints
(2D offsets + metric DEPTH per keypoint) from each image independently,
matches descriptors, and solves the metric relative pose from the 3D-3D
correspondences; the wrapper returns the inlier correspondences.

TPU-first: the depth-augmented keypoints lift to camera-ray 3D points
(assumed-intrinsics pinhole, like the published inference defaults when
no calibration is given); matching is masked mutual-softmax; the metric
pose is our on-device Procrustes (Kabsch) over soft-inlier weights with
one reweighting iteration — fixed shapes, no host RANSAC loop, and the
3D residual gates the returned inliers.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops.ransac import highest_precision
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import (batch_norm_inference, conv2d, init_conv, max_pool,
                      relu)

DESC_DIM = 128
CELL = 8


def init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _cbr(key, cin, cout):
    return {"conv": init_conv(key, 3, 3, cin, cout, bias=False),
            "bn": init_bn(cout)}


def init_params(rng):
    keys = jax.random.split(rng, 9)
    return {
        "trunk": [_cbr(keys[0], 3, 64), _cbr(keys[1], 64, 64),
                  _cbr(keys[2], 64, 128), _cbr(keys[3], 128, 128)],
        "offset": init_conv(keys[4], 1, 1, 128, 2),
        "depth": init_conv(keys[5], 1, 1, 128, 1),
        "score": init_conv(keys[6], 1, 1, 128, 1),
        "desc": init_conv(keys[7], 1, 1, 128, DESC_DIM),
    }


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("mickey/" + conf.get("model_name", "mickey.ckpt"), init, "mickey")


def heads(params, x):
    """x: (B, H, W, 3) → per-/8-cell keypoints (px), depth (m), score,
    desc."""
    for i, p in enumerate(params["trunk"]):
        x = relu(batch_norm_inference(p["bn"], conv2d(p["conv"], x)))
        if i in (0, 1, 2):
            x = max_pool(x)
    off = jnp.tanh(conv2d(params["offset"], x)) * (CELL / 2)
    depth = jax.nn.softplus(conv2d(params["depth"], x))[..., 0] + 0.1
    score = jax.nn.sigmoid(conv2d(params["score"], x))[..., 0]
    desc = conv2d(params["desc"], x)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    b, hc, wc = score.shape
    gy, gx = jnp.meshgrid(jnp.arange(hc), jnp.arange(wc), indexing="ij")
    centers = jnp.stack([gx, gy], -1).astype(jnp.float32) * CELL \
        + CELL / 2
    kpts = centers[None] + off
    return kpts, depth, score, desc


def lift(kpts, depth, size):
    """Pinhole backprojection with the published default intrinsics
    (f = 0.7·max(w, h), principal point at the center)."""
    f = 0.7 * jnp.maximum(size[0], size[1])
    cx, cy = size[0] / 2, size[1] / 2
    x = (kpts[..., 0] - cx) / f * depth
    y = (kpts[..., 1] - cy) / f * depth
    return jnp.stack([x, y, depth], -1)


@highest_precision
def kabsch(p, q, w):
    """Weighted rigid alignment p→q. p/q: (N, 3); w: (N,)."""
    wsum = jnp.maximum(w.sum(), 1e-6)
    mu_p = (p * w[:, None]).sum(0) / wsum
    mu_q = (q * w[:, None]).sum(0) / wsum
    cov = ((q - mu_q) * w[:, None]).T @ (p - mu_p)
    u, _, vt = jnp.linalg.svd(cov)
    s = jnp.sign(jnp.linalg.det(u @ vt))
    d = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]))
    d = d.at[2, 2].set(s)
    r = u @ d @ vt
    t = mu_q - r @ mu_p
    return r, t


def forward_pair(params_out, size0, size1, threshold):
    k0, d0, s0, f0, k1, d1, s1, f1 = params_out
    hc0, wc0 = s0.shape
    f0f = f0.reshape(-1, DESC_DIM)
    f1f = f1.reshape(-1, DESC_DIM)
    sim = (f0f @ f1f.T) / 0.1
    conf = jax.nn.softmax(sim, 1) * jax.nn.softmax(sim, 0)
    nn01 = jnp.argmax(conf, 1)
    nn10 = jnp.argmax(conf, 0)
    mutual = jnp.arange(conf.shape[0]) == jnp.take(nn10, nn01)
    mscore = jnp.max(conf, 1) * s0.reshape(-1)
    ok = mutual & (mscore > threshold)

    p0 = k0.reshape(-1, 2)
    p1 = jnp.take(k1.reshape(-1, 2), nn01, axis=0)
    x0 = lift(p0, d0.reshape(-1), size0)
    x1 = jnp.take(lift(k1.reshape(-1, 2), d1.reshape(-1), size1), nn01,
                  axis=0)
    # metric pose: weighted Kabsch + one robust reweighting iteration
    w = jnp.where(ok, mscore, 0.0)
    r, t = kabsch(x0, x1, w)
    res = jnp.linalg.norm(x0 @ r.T + t - x1, axis=-1)
    sigma = 0.25  # m
    w2 = w * jnp.exp(-(res / sigma) ** 2)
    r, t = kabsch(x0, x1, w2)
    res = jnp.linalg.norm(x0 @ r.T + t - x1, axis=-1)
    inlier = ok & (res < 3 * sigma)
    return {"keypoints0": jnp.where(inlier[:, None], p0, 0.0),
            "keypoints1": jnp.where(inlier[:, None], p1, 0.0),
            "scores": jnp.where(inlier, mscore, 0.0),
            "mask": inlier, "R": r, "t": t}


@functools.partial(jax.jit, static_argnames=("threshold",))
def _apply_batched(params, image0, image1, size0, size1, threshold):
    k0, d0, s0, f0 = heads(params, image0)
    k1, d1, s1, f1 = heads(params, image1)
    return jax.vmap(
        lambda *a: forward_pair(a[:8], a[8], a[9], threshold)
    )(k0, d0, s0, f0, k1, d1, s1, f1, size0, size1)


class Mickey(BaseModel):
    """Reference contract: imcui/hloc/matchers/mickey.py:15."""

    default_conf = {
        "config_path": "config.yaml",
        "model_name": "mickey.ckpt",
        "max_keypoints": 3000,
        "match_threshold": 0.0,
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)

    def _forward(self, data):
        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)
        b = image0.shape[0]

        def prep(img):
            x = img.transpose(0, 2, 3, 1)
            if x.shape[-1] == 1:
                x = jnp.tile(x, (1, 1, 1, 3))
            return x

        h0, w0 = image0.shape[-2:]
        h1, w1 = image1.shape[-2:]
        out = _apply_batched(
            self.params, prep(image0), prep(image1),
            jnp.tile(jnp.asarray([[w0, h0]], jnp.float32), (b, 1)),
            jnp.tile(jnp.asarray([[w1, h1]], jnp.float32), (b, 1)),
            float(self.conf.get("match_threshold", 0.0)))
        out["mconf"] = out["scores"]
        return out
