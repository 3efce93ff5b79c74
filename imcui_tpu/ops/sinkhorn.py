"""Masked log-domain Sinkhorn optimal transport with dustbins.

The assignment solver inside SuperGlue (reference contract:
imcui/hloc/matchers/superglue.py:13-43 + sinkhorn_iterations conf,
imcui/hloc/configs/matchers.py:14-16). TPU-first design:

- iterations are a ``lax.scan`` (single compiled loop body, no Python
  unrolling blow-up),
- padded keypoints carry **zero mass**: their rows/cols are excluded from
  the marginals and their scores forced to -inf, so one executable serves
  every keypoint count ≤ max_keypoints.
"""

import jax.numpy as jnp
from jax import lax
from jax.scipy.special import logsumexp

NEG_INF = -1e9


def log_sinkhorn_iterations(Z, log_mu, log_nu, iters):
    """Sinkhorn in log space. Z: (M+1, N+1) scores incl. dustbins."""

    def body(carry, _):
        u, v = carry
        u = log_mu - logsumexp(Z + v[None, :], axis=1)
        v = log_nu - logsumexp(Z + u[:, None], axis=0)
        return (u, v), None

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    (u, v), _ = lax.scan(body, (u0, v0), None, length=iters)
    return Z + u[:, None] + v[None, :]


def log_optimal_transport(scores, alpha, iters, mask0=None, mask1=None):
    """Differentiable optimal transport with dustbin row/col.

    scores: (M, N) similarity logits; alpha: scalar dustbin score.
    mask0/mask1: validity of rows/cols (padded slots get zero mass).
    Returns (M+1, N+1) log assignment matrix.
    """
    m, n = scores.shape
    one = jnp.ones((), scores.dtype)
    if mask0 is None:
        mask0 = jnp.ones((m,), bool)
    if mask1 is None:
        mask1 = jnp.ones((n,), bool)
    ms = jnp.sum(mask0.astype(scores.dtype))
    ns = jnp.sum(mask1.astype(scores.dtype))

    # mask invalid scores (keep dustbin reachable)
    scores = jnp.where(mask0[:, None] & mask1[None, :], scores, NEG_INF)

    bins0 = jnp.full((m, 1), alpha, scores.dtype)
    bins1 = jnp.full((1, n), alpha, scores.dtype)
    bins0 = jnp.where(mask0[:, None], bins0, NEG_INF)
    bins1 = jnp.where(mask1[None, :], bins1, NEG_INF)
    couplings = jnp.concatenate(
        [
            jnp.concatenate([scores, bins0], 1),
            jnp.concatenate([bins1, alpha * jnp.ones((1, 1), scores.dtype)], 1),
        ],
        0,
    )

    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate([jnp.where(mask0, norm, NEG_INF), (jnp.log(ns) + norm)[None]])
    log_nu = jnp.concatenate([jnp.where(mask1, norm, NEG_INF), (jnp.log(ms) + norm)[None]])

    Z = log_sinkhorn_iterations(couplings, log_mu, log_nu, iters)
    Z = Z - norm  # multiply probabilities by M+N
    del one
    return Z


def matches_from_assignment(Z, match_threshold=0.2, mask0=None, mask1=None):
    """Extract mutual-argmax matches from a (M+1, N+1) log-assignment
    (SuperGlue decoding: mutual max over the non-dustbin block, threshold
    on exp(score)). Returns matches0 (M,), matching_scores0 (M,)."""
    probs = jnp.exp(Z[:-1, :-1])
    if mask0 is not None:
        probs = jnp.where(mask0[:, None], probs, 0.0)
    if mask1 is not None:
        probs = jnp.where(mask1[None, :], probs, 0.0)
    idx0 = jnp.argmax(probs, axis=1)
    idx1 = jnp.argmax(probs, axis=0)
    m = probs.shape[0]
    inds0 = jnp.arange(m)
    mutual = inds0 == jnp.take(idx1, idx0)
    scores = jnp.max(probs, axis=1)
    valid = mutual & (scores > match_threshold)
    if mask0 is not None:
        valid = valid & mask0
    matches0 = jnp.where(valid, idx0, -1).astype(jnp.int32)
    return matches0, jnp.where(valid, scores, 0.0)
