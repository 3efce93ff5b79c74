"""AdaLAM filter + XFeat-dense matcher tests."""

import numpy as np
import pytest


def test_adalam_filters_affine_outliers(rng):
    from imcui_tpu.models.matchers.adalam import AdaLAM

    n, n_out = 256, 64
    k0 = rng.uniform(0, 640, (n, 2)).astype(np.float32)
    A = np.array([[0.9, 0.1], [-0.05, 1.05]])
    b = np.array([20.0, -10.0])
    k1 = (k0 @ A.T + b).astype(np.float32)
    k1[:n_out] = rng.uniform(0, 640, (n_out, 2))
    d = rng.randn(n, 64).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    out = AdaLAM({"num_seeds": 64, "min_support": 6})({
        "keypoints0": k0[None], "keypoints1": k1[None],
        "descriptors0": d.T[None], "descriptors1": d.T[None],
        "size0": np.array([[640.0, 640.0]]),
        "size1": np.array([[640.0, 640.0]]),
    })
    kept = np.asarray(out["matches0"][0]) > -1
    assert kept[n_out:].mean() > 0.5      # keeps most affine inliers
    assert kept[:n_out].mean() < 0.15     # rejects most outliers


def test_xfeat_dense_contract(rng):
    from imcui_tpu.models.matchers.xfeat_dense import XFeatDense

    m = XFeatDense({"max_keypoints": 256})
    im = rng.rand(1, 1, 96, 128).astype(np.float32)
    out = m({"image0": im, "image1": im.copy()})
    mask = np.asarray(out["mask"][0])
    k0 = np.asarray(out["keypoints0"][0])[mask]
    k1 = np.asarray(out["keypoints1"][0])[mask]
    assert mask.sum() > 50
    np.testing.assert_allclose(k0, k1)  # identity on self pair
