"""LISRD meta-weighted matcher tests."""

import numpy as np
import pytest


def test_lisrd_self_pair_identity(rng, monkeypatch, tmp_path):
    from imcui_tpu.models.matchers.lisrd import Lisrd

    # pin the random-init detector: the serving extractor auto-loads the
    # locally trained SuperPoint (utils.weights.local_trained_npz),
    # which correctly finds ~no corners in a noise image — this test
    # checks self-pair identity mechanics, not detection quality
    monkeypatch.setenv("IMCUI_WEIGHTS_DIR", str(tmp_path / "no_weights"))
    m = Lisrd({"max_keypoints": 128, "detector": "superpoint"})
    im = rng.rand(1, 1, 96, 128).astype(np.float32)
    out = m({"image0": im, "image1": im.copy()})
    mask = np.asarray(out["mask"][0])
    assert mask.sum() > 64
    k0 = np.asarray(out["keypoints0"][0])[mask]
    k1 = np.asarray(out["keypoints1"][0])[mask]
    np.testing.assert_allclose(k0, k1)


def test_lisrd_match_op_weights(rng):
    """The meta-weighted similarity must prefer the invariance whose
    descriptors agree: construct descs where variance 0 matches identity
    but variance 1 is shuffled — meta weights pick variance 0."""
    import jax.numpy as jnp

    from imcui_tpu.models.matchers.lisrd import lisrd_match

    n = 32
    d = rng.randn(n, 4, 128).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d1 = d.copy()
    perm = rng.permutation(n)
    d1[:, 1] = d[perm, 1]  # break invariance 1
    meta = rng.randn(n, 4, 128).astype(np.float32)
    matches, scores = lisrd_match(
        jnp.asarray(d), jnp.asarray(d1), jnp.asarray(meta),
        jnp.asarray(meta.copy()), jnp.ones(n, bool), jnp.ones(n, bool),
    )
    m = np.asarray(matches)
    assert (m == np.arange(n)).mean() > 0.9
