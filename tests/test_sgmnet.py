"""SGMNet seeded graph matcher tests."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sgmnet():
    from imcui_tpu.models.matchers.sgmnet import SGMNet

    return SGMNet({"layer_num": 2, "seed_top_k": 32,
                   "sinkhorn_iterations": 20, "match_threshold": 0.0})


def make_inputs(rng, n=96):
    d = rng.randn(1, n, 128).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "keypoints0": rng.rand(1, n, 2).astype(np.float32) * 300,
        "keypoints1": rng.rand(1, n, 2).astype(np.float32) * 300,
        "descriptors0": d, "descriptors1": d.copy(),
        "size0": np.array([[320.0, 320.0]], np.float32),
        "size1": np.array([[320.0, 320.0]], np.float32),
    }


def test_identity_matching(sgmnet, rng):
    out = sgmnet(make_inputs(rng))
    m0 = np.asarray(out["matches0"][0])
    matched = m0 > -1
    assert matched.sum() > 50
    assert (m0[matched] == np.where(matched)[0]).mean() > 0.9


def test_padding_invariance(sgmnet, rng):
    data = make_inputs(rng)
    base = np.asarray(sgmnet(data)["matches0"][0])
    pad = 32
    n = data["keypoints0"].shape[1]
    d2 = dict(data)
    for key in ("keypoints0", "descriptors0"):
        garbage = rng.rand(1, pad, data[key].shape[2]).astype(np.float32)
        d2[key] = np.concatenate([data[key], garbage], 1)
    d2["mask0"] = np.concatenate(
        [np.ones((1, n), bool), np.zeros((1, pad), bool)], 1)
    out = np.asarray(sgmnet(d2)["matches0"][0])
    np.testing.assert_array_equal(out[:n], base)
    assert (out[n:] == -1).all()
