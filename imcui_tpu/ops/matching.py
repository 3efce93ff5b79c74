"""Descriptor matching ops: mutual NN + ratio test, dual-softmax.

These are the reference's two in-repo matcher algorithms
(reference: imcui/hloc/matchers/nearest_neighbor.py:6-24 find_nn/mutual_check,
imcui/hloc/matchers/dual_softmax.py:8-36 dual_softmax), re-expressed as
masked fixed-shape JAX: the similarity einsum runs on the MXU, validity
masks replace the reference's dynamic keypoint counts, and ``matches0 == -1``
for both unmatched and padded slots (contract preserved).
"""

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e9


def masked_similarity(desc0, desc1, mask0=None, mask1=None):
    """Cosine-similarity matrix with invalid rows/cols pushed to -inf.

    desc0: (N0, D), desc1: (N1, D) — assumed L2-normalised.
    Returns (N0, N1) float32.
    """
    sim = jnp.einsum(
        "nd,md->nm", desc0, desc1, preferred_element_type=jnp.float32
    )
    if mask0 is not None:
        sim = jnp.where(mask0[:, None], sim, NEG_INF)
    if mask1 is not None:
        sim = jnp.where(mask1[None, :], sim, NEG_INF)
    return sim


def find_nn(sim, ratio_thresh=None, distance_thresh=None):
    """Top-1 match per row with optional Lowe ratio + distance tests
    (reference parity: imcui/hloc/matchers/nearest_neighbor.py:6-16).

    sim: (N0, N1) cosine similarities (masked with NEG_INF where invalid).
    Returns matches0 (N0,) int32 in [-1, N1), scores0 (N0,) float32.
    """
    k = 2 if ratio_thresh else 1
    sim_nn, ind_nn = lax.top_k(sim, k)
    dist_nn = 2.0 * (1.0 - sim_nn)  # squared L2 for unit vectors
    mask = sim_nn[..., 0] > NEG_INF / 2
    if ratio_thresh:
        mask = mask & (dist_nn[..., 0] <= (ratio_thresh**2) * dist_nn[..., 1])
    if distance_thresh:
        mask = mask & (dist_nn[..., 0] <= distance_thresh**2)
    matches = jnp.where(mask, ind_nn[..., 0], -1)
    scores = jnp.where(mask, (sim_nn[..., 0] + 1) / 2.0, 0.0)
    return matches.astype(jnp.int32), scores


def mutual_check(m0, m1):
    """Keep only cycle-consistent matches (reference parity:
    imcui/hloc/matchers/nearest_neighbor.py:19-24)."""
    n0 = m0.shape[-1]
    inds0 = jnp.arange(n0, dtype=m0.dtype)
    loop = jnp.take(m1, jnp.clip(m0, 0, m1.shape[-1] - 1), axis=-1)
    ok = (m0 > -1) & (inds0 == loop)
    return jnp.where(ok, m0, -1)


def mutual_nn_match(
    desc0, desc1, mask0=None, mask1=None,
    ratio_thresh=None, distance_thresh=None, do_mutual_check=True,
):
    """Full NN matcher (reference contract:
    imcui/hloc/matchers/nearest_neighbor.py:27-66 NearestNeighbor._forward).

    Returns dict with matches0 (N0,), matching_scores0 (N0,).
    """
    sim = masked_similarity(desc0, desc1, mask0, mask1)
    m0, s0 = find_nn(sim, ratio_thresh, distance_thresh)
    if do_mutual_check:
        m1, _ = find_nn(sim.T, ratio_thresh, distance_thresh)
        m0 = mutual_check(m0, m1)
        s0 = jnp.where(m0 > -1, s0, 0.0)
    return {"matches0": m0, "matching_scores0": s0}


def dual_softmax_match(
    desc0, desc1, mask0=None, mask1=None,
    inv_temperature=20.0, match_threshold=0.2,
):
    """Dual-softmax assignment (reference parity:
    imcui/hloc/matchers/dual_softmax.py:8-36): P = softmax_rows ⊙
    softmax_cols of the scaled similarity; keep mutual argmaxes over the
    threshold.
    """
    sim = masked_similarity(desc0, desc1, mask0, mask1) * inv_temperature
    p = jax.nn.softmax(sim, axis=-1) * jax.nn.softmax(sim, axis=-2)

    # mutual argmax
    idx0 = jnp.argmax(p, axis=-1)
    idx1 = jnp.argmax(p, axis=-2)
    n0 = p.shape[0]
    inds0 = jnp.arange(n0)
    mutual = inds0 == jnp.take(idx1, idx0)
    scores = jnp.max(p, axis=-1)
    valid = mutual & (scores > match_threshold)
    if mask0 is not None:
        valid = valid & mask0
    matches0 = jnp.where(valid, idx0, -1).astype(jnp.int32)
    return {
        "matches0": matches0,
        "matching_scores0": jnp.where(valid, scores, 0.0),
        "similarity": p,
    }
