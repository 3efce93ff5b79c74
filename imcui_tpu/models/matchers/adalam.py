"""AdaLAM handcrafted outlier filter, native JAX.

Reference contract: imcui/hloc/matchers/adalam.py:8 — kornia's AdaLAM
(Adaptive Locally-Affine Matching): ratio-test NN matches are filtered by
local affine-consistency voting around spatially spread seed matches.

TPU-first shape discipline: a fixed number of seeds is selected by
confidence-weighted spatial spreading (top-k over suppression-masked
scores), every (seed, match) pair is scored in one (S, N) residual matrix,
and matches survive when enough neighbours agree with the seed's local
affine estimate. No per-seed host loops, no dynamic shapes.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops.matching import mutual_nn_match
from ...utils.base_model import BaseModel


def _fit_local_affine(k0, k1, w):
    """Weighted least-squares affine A, b with k1 ≈ k0 @ Aᵀ + b.
    k0/k1: (N, 2); w: (N,). Closed form via normal equations."""
    wsum = jnp.maximum(w.sum(), 1e-8)
    mu0 = (k0 * w[:, None]).sum(0) / wsum
    mu1 = (k1 * w[:, None]).sum(0) / wsum
    c0 = k0 - mu0
    c1 = k1 - mu1
    cov = jnp.einsum("ni,nj->ij", c0 * w[:, None], c1)  # (2, 2)
    var = jnp.einsum("ni,nj->ij", c0 * w[:, None], c0) + 1e-6 * jnp.eye(2)
    # A = var⁻¹ cov  (2×2 closed-form inverse)
    det = var[0, 0] * var[1, 1] - var[0, 1] * var[1, 0]
    inv = jnp.array(
        [[var[1, 1], -var[0, 1]], [-var[1, 0], var[0, 0]]]
    ) / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    A = inv @ cov
    b = mu1 - mu0 @ A
    return A, b


def adalam_filter(
    kpts0, kpts1, matches0, scores0, mask0,
    num_seeds=64, seed_radius=0.15, residual_threshold=0.1,
    min_support=6,
):
    """Filter NN matches by local affine consistency.

    kpts0/1: (N, 2) (kpts1 indexed by matches0); matches0: (N,) int;
    coordinates are normalised to [0, 1] by the caller. Returns a refined
    matches0 with outliers set to -1.
    """
    n = kpts0.shape[0]
    valid = (matches0 > -1) & mask0
    mk1 = jnp.take(kpts1, jnp.clip(matches0, 0, kpts1.shape[0] - 1),
                   axis=0)

    # --- seed selection: confidence top-k with spatial spreading --------
    # suppress matches close to a stronger match (greedy via iterative
    # top-k on a distance-suppressed score is approximated by one round:
    # score - strongest-neighbour penalty)
    d00 = jnp.linalg.norm(kpts0[:, None] - kpts0[None, :], axis=-1)
    stronger = (scores0[None, :] > scores0[:, None]) & \
        (d00 < seed_radius) & valid[None, :]
    suppressed = stronger.any(1)
    seed_scores = jnp.where(valid & ~suppressed, scores0, -1.0)
    _, seed_idx = jax.lax.top_k(seed_scores, num_seeds)
    seed_ok = jnp.take(seed_scores, seed_idx) > 0

    s0 = kpts0[seed_idx]  # (S, 2)
    # --- neighbourhood weights per seed ---------------------------------
    dist = jnp.linalg.norm(kpts0[None, :] - s0[:, None], axis=-1)  # (S, N)
    nbr_w = jnp.exp(-(dist / seed_radius) ** 2) * valid[None, :]

    def per_seed(w):
        A, b = _fit_local_affine(kpts0, mk1, w)
        pred = kpts0 @ A + b
        r = jnp.linalg.norm(pred - mk1, axis=-1)
        return r

    residuals = jax.vmap(per_seed)(nbr_w)  # (S, N)
    consistent = (residuals < residual_threshold) & valid[None, :] \
        & (nbr_w > 0.1)
    support = consistent.sum(1)  # (S,)
    good_seed = seed_ok & (support >= min_support)
    # a match survives if any good seed's local affine explains it
    keep = (consistent & good_seed[:, None]).any(0)
    return jnp.where(keep, matches0, -1), keep


@functools.partial(
    jax.jit,
    static_argnames=("num_seeds", "min_support"),
)
def _apply(kpts0, kpts1, desc0, desc1, mask0, mask1, size0, size1,
           num_seeds=64, min_support=6):
    def per_pair(k0, k1, d0, d1, m0, m1, s0, s1):
        nn = mutual_nn_match(d0.T, d1.T, mask0=m0, mask1=m1,
                             ratio_thresh=0.95)
        k0n = k0 / jnp.maximum(s0[None, :], 1.0)
        k1n = k1 / jnp.maximum(s1[None, :], 1.0)
        matches0, keep = adalam_filter(
            k0n, k1n, nn["matches0"], nn["matching_scores0"], m0,
            num_seeds=num_seeds, min_support=min_support,
        )
        return {
            "matches0": matches0,
            "matching_scores0": jnp.where(keep, nn["matching_scores0"],
                                          0.0),
        }

    return jax.vmap(per_pair)(kpts0, kpts1, desc0, desc1, mask0, mask1,
                              size0, size1)


class AdaLAM(BaseModel):
    """Reference contract: imcui/hloc/matchers/adalam.py:8."""

    default_conf = {
        "num_seeds": 64,
        "min_support": 6,
    }
    required_inputs = [
        "keypoints0", "keypoints1", "descriptors0", "descriptors1",
    ]

    def _init(self, conf, rng):
        self.meta = {"pretrained": True}  # handcrafted

    def _forward(self, data):
        kpts0 = jnp.asarray(data["keypoints0"], jnp.float32)
        kpts1 = jnp.asarray(data["keypoints1"], jnp.float32)
        desc0 = jnp.asarray(data["descriptors0"], jnp.float32)
        desc1 = jnp.asarray(data["descriptors1"], jnp.float32)
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
                return jnp.tile(jnp.asarray([[w, h]], jnp.float32), (b, 1))
            return jnp.max(kpts[..., :2], axis=1) + 1.0

        return _apply(
            kpts0, kpts1, desc0, desc1, mask0, mask1,
            sizes("image0", "size0", kpts0), sizes("image1", "size1",
                                                   kpts1),
            num_seeds=int(self.conf["num_seeds"]),
            min_support=int(self.conf["min_support"]),
        )
