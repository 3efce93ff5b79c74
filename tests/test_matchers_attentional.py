"""LightGlue / SuperGlue contract + masking tests (random-init weights).

The padding-invariance tests are the strong ones: adding garbage padded
slots must not change any valid output — this exercises the attention
masks, the assignment masking, and the Sinkhorn zero-mass handling.
"""

import numpy as np
import pytest

N0, N1, D = 48, 40, 256


def make_inputs(rng, n0=N0, n1=N1, d=D, pad0=0, pad1=0):
    kpts0 = rng.uniform(0, 320, (1, n0 + pad0, 2)).astype(np.float32)
    kpts1 = rng.uniform(0, 320, (1, n1 + pad1, 2)).astype(np.float32)
    desc0 = rng.randn(1, n0 + pad0, d).astype(np.float32)
    desc1 = rng.randn(1, n1 + pad1, d).astype(np.float32)
    desc0 /= np.linalg.norm(desc0, axis=-1, keepdims=True)
    desc1 /= np.linalg.norm(desc1, axis=-1, keepdims=True)
    mask0 = np.zeros((1, n0 + pad0), bool)
    mask0[:, :n0] = True
    mask1 = np.zeros((1, n1 + pad1), bool)
    mask1[:, :n1] = True
    return {
        "keypoints0": kpts0, "keypoints1": kpts1,
        "descriptors0": desc0, "descriptors1": desc1,
        "scores0": rng.rand(1, n0 + pad0).astype(np.float32),
        "scores1": rng.rand(1, n1 + pad1).astype(np.float32),
        "mask0": mask0, "mask1": mask1,
        "size0": np.array([[320.0, 320.0]], np.float32),
        "size1": np.array([[320.0, 320.0]], np.float32),
    }


@pytest.fixture(scope="module")
def lightglue():
    from imcui_tpu.models.matchers.lightglue import LightGlue

    return LightGlue({"n_layers": 2, "match_threshold": 0.0})


@pytest.fixture(scope="module")
def superglue():
    from imcui_tpu.models.matchers.superglue import SuperGlue

    return SuperGlue({"gnn_layers": 4, "sinkhorn_iterations": 20,
                      "match_threshold": 0.0})


def test_lightglue_contract(lightglue, rng):
    data = make_inputs(rng)
    out = lightglue(data)
    m0 = np.asarray(out["matches0"])
    s0 = np.asarray(out["matching_scores0"])
    assert m0.shape == (1, N0) and s0.shape == (1, N0)
    assert ((m0 >= -1) & (m0 < N1)).all()
    assert (s0[m0 == -1] == 0).all()


def test_lightglue_padding_invariance(lightglue, rng):
    base = make_inputs(rng)
    out_base = np.asarray(lightglue(base)["matches0"])

    rng2 = np.random.RandomState(99)
    padded = make_inputs(rng, pad0=16, pad1=24)
    # same valid content, garbage in the pad slots
    for k in ("keypoints0", "descriptors0", "scores0"):
        padded[k][:, :N0] = base[k]
        padded[k][:, N0:] = rng2.rand(*padded[k][:, N0:].shape)
    for k in ("keypoints1", "descriptors1", "scores1"):
        padded[k][:, :N1] = base[k]
        padded[k][:, N1:] = rng2.rand(*padded[k][:, N1:].shape)
    out_pad = np.asarray(lightglue(padded)["matches0"])
    np.testing.assert_array_equal(out_pad[:, :N0], out_base)
    assert (out_pad[:, N0:] == -1).all()


def test_lightglue_identity_matching(lightglue, rng):
    """Identical inputs on both sides → diagonal matching (any weights:
    similarity is maximal on the diagonal after shared encoding)."""
    data = make_inputs(rng, n0=32, n1=32)
    for k in ("keypoints1", "descriptors1", "scores1"):
        data[k] = data[k.replace("1", "0")].copy()
    data["mask1"] = data["mask0"].copy()
    data["size1"] = data["size0"].copy()
    out = lightglue(data)
    m0 = np.asarray(out["matches0"][0])
    matched = m0 > -1
    assert matched.sum() > 16
    np.testing.assert_array_equal(m0[matched], np.arange(32)[matched])


def test_superglue_contract(superglue, rng):
    data = make_inputs(rng)
    out = superglue(data)
    m0 = np.asarray(out["matches0"])
    assert m0.shape == (1, N0)
    assert ((m0 >= -1) & (m0 < N1)).all()


def test_superglue_padding_invariance(superglue, rng):
    base = make_inputs(rng)
    out_base = np.asarray(superglue(base)["matches0"])
    rng2 = np.random.RandomState(7)
    padded = make_inputs(rng, pad0=16, pad1=8)
    for k in ("keypoints0", "descriptors0", "scores0"):
        padded[k][:, :N0] = base[k]
        padded[k][:, N0:] = rng2.rand(*padded[k][:, N0:].shape)
    for k in ("keypoints1", "descriptors1", "scores1"):
        padded[k][:, :N1] = base[k]
        padded[k][:, N1:] = rng2.rand(*padded[k][:, N1:].shape)
    out_pad = np.asarray(superglue(padded)["matches0"])
    np.testing.assert_array_equal(out_pad[:, :N0], out_base)
    assert (out_pad[:, N0:] == -1).all()


def test_superglue_identity_matching(superglue, rng):
    data = make_inputs(rng, n0=32, n1=32)
    for k in ("keypoints1", "descriptors1", "scores1"):
        data[k] = data[k.replace("1", "0")].copy()
    data["mask1"] = data["mask0"].copy()
    data["size1"] = data["size0"].copy()
    out = superglue(data)
    m0 = np.asarray(out["matches0"][0])
    matched = m0 > -1
    assert matched.sum() > 16
    np.testing.assert_array_equal(m0[matched], np.arange(32)[matched])


def test_lightglue_pair_batching(lightglue, rng):
    """A batch of B pairs gives the same answers as B single pairs."""
    d1 = make_inputs(rng)
    d2 = make_inputs(np.random.RandomState(5))
    batched = {
        k: np.concatenate([d1[k], d2[k]], axis=0) for k in d1
    }
    out_b = np.asarray(lightglue(batched)["matches0"])
    out_1 = np.asarray(lightglue(d1)["matches0"])
    out_2 = np.asarray(lightglue(d2)["matches0"])
    np.testing.assert_array_equal(out_b[0], out_1[0])
    np.testing.assert_array_equal(out_b[1], out_2[0])
