"""Unit tests for matching ops vs brute-force numpy references."""

import jax.numpy as jnp
import numpy as np

from imcui_tpu.ops import matching, sinkhorn


def unit(rng, n, d):
    x = rng.randn(n, d).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_mutual_nn_identity(rng):
    d0 = unit(rng, 32, 64)
    perm = rng.permutation(32)
    d1 = d0[perm]
    out = matching.mutual_nn_match(jnp.asarray(d0), jnp.asarray(d1))
    m0 = np.asarray(out["matches0"])
    inv = np.empty(32, int)
    inv[perm] = np.arange(32)
    # d1[i] = d0[perm[i]] → match of d0[j] is i with perm[i]=j
    np.testing.assert_array_equal(m0, inv)


def test_mutual_nn_respects_padding(rng):
    d0 = unit(rng, 16, 64)
    d1 = d0.copy()
    mask0 = np.ones(16, bool)
    mask1 = np.ones(16, bool)
    mask1[8:] = False  # pad half of image-1 keypoints
    out = matching.mutual_nn_match(
        jnp.asarray(d0), jnp.asarray(d1),
        mask0=jnp.asarray(mask0), mask1=jnp.asarray(mask1),
    )
    m0 = np.asarray(out["matches0"])
    np.testing.assert_array_equal(m0[:8], np.arange(8))
    assert (m0[8:] == -1).all()  # their partners are padded out


def test_ratio_test_rejects_ambiguous(rng):
    # two nearly identical db vectors, noisy query → ratio test must reject
    base = unit(rng, 1, 32)
    q = base + 0.2 * rng.randn(1, 32).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    d1 = np.stack([base[0], base[0] + 1e-3 * rng.randn(32).astype(np.float32)])
    d1 = d1 / np.linalg.norm(d1, axis=-1, keepdims=True)
    out = matching.mutual_nn_match(
        jnp.asarray(q), jnp.asarray(d1), ratio_thresh=0.8,
        do_mutual_check=False,
    )
    assert int(out["matches0"][0]) == -1


def test_dual_softmax_identity(rng):
    d0 = unit(rng, 24, 64)
    out = matching.dual_softmax_match(jnp.asarray(d0), jnp.asarray(d0),
                                      match_threshold=0.01)
    m0 = np.asarray(out["matches0"])
    np.testing.assert_array_equal(m0, np.arange(24))


def test_dual_softmax_padding_invariance(rng):
    d0 = unit(rng, 16, 64)
    d1 = unit(rng, 16, 64)
    base = matching.dual_softmax_match(jnp.asarray(d0), jnp.asarray(d1),
                                       match_threshold=0.05)
    # pad with garbage + masks → same matches on the valid prefix
    pad = unit(rng, 8, 64)
    d0p = np.concatenate([d0, pad])
    d1p = np.concatenate([d1, pad])
    m0 = np.concatenate([np.ones(16, bool), np.zeros(8, bool)])
    out = matching.dual_softmax_match(
        jnp.asarray(d0p), jnp.asarray(d1p),
        mask0=jnp.asarray(m0), mask1=jnp.asarray(m0),
        match_threshold=0.05,
    )
    np.testing.assert_array_equal(
        np.asarray(out["matches0"])[:16], np.asarray(base["matches0"])
    )
    assert (np.asarray(out["matches0"])[16:] == -1).all()


def test_sinkhorn_marginals(rng):
    scores = jnp.asarray(rng.randn(12, 10).astype(np.float32))
    Z = sinkhorn.log_optimal_transport(scores, jnp.asarray(1.0), iters=50)
    P = np.exp(np.asarray(Z))  # scaled by M+N
    # each point row sums to 1 (match + dustbin), in the M+N scaling
    np.testing.assert_allclose(P[:-1].sum(1), 1.0, atol=1e-3)
    np.testing.assert_allclose(P[:, :-1].sum(0), 1.0, atol=1e-3)


def test_sinkhorn_identity_assignment(rng):
    d = unit(rng, 16, 64)
    scores = jnp.asarray(30.0 * d @ d.T)
    Z = sinkhorn.log_optimal_transport(scores, jnp.asarray(1.0), iters=50)
    m0, s0 = sinkhorn.matches_from_assignment(Z, match_threshold=0.2)
    np.testing.assert_array_equal(np.asarray(m0), np.arange(16))
    assert (np.asarray(s0) > 0.2).all()


def test_sinkhorn_padding_invariance(rng):
    d0 = unit(rng, 12, 32)
    d1 = unit(rng, 12, 32)
    scores = 20.0 * d0 @ d1.T
    Z_base = sinkhorn.log_optimal_transport(
        jnp.asarray(scores), jnp.asarray(1.0), iters=60)
    m_base, _ = sinkhorn.matches_from_assignment(Z_base)

    pad0 = np.full((4, 12), 5.0, np.float32)
    scores_p = np.concatenate([scores, pad0], 0)
    mask0 = np.concatenate([np.ones(12, bool), np.zeros(4, bool)])
    Z = sinkhorn.log_optimal_transport(
        jnp.asarray(scores_p), jnp.asarray(1.0), iters=60,
        mask0=jnp.asarray(mask0),
    )
    m_pad, _ = sinkhorn.matches_from_assignment(Z, mask0=jnp.asarray(mask0))
    np.testing.assert_array_equal(np.asarray(m_pad)[:12], np.asarray(m_base))
    assert (np.asarray(m_pad)[12:] == -1).all()
