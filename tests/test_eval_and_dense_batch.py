"""Tests: MegaDepth eval harness on synthetic geometry + the batch dense
matching pipeline (keypoint aggregation → HDF5)."""

import json
import shutil

import numpy as np
import pytest


def test_eval_harness_synthetic(tmp_path, rng):
    """Perfect synthetic correspondences → AUC ≈ 1; garbage → AUC ≈ 0."""
    from imcui_tpu.eval import megadepth

    K = np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1]])
    angle = 0.3
    R = np.array(
        [
            [np.cos(angle), 0, np.sin(angle)],
            [0, 1, 0],
            [-np.sin(angle), 0, np.cos(angle)],
        ]
    )
    t = np.array([1.0, 0.1, 0.05])
    t /= np.linalg.norm(t)

    X = rng.uniform(-2, 2, (300, 3)) + np.array([0, 0, 5.0])
    x0 = X @ K.T
    p0 = (x0[:, :2] / x0[:, 2:]).astype(np.float32)
    Xc1 = X @ R.T + t
    x1 = Xc1 @ K.T
    p1 = (x1[:, :2] / x1[:, 2:]).astype(np.float32)

    pairs = [
        {"img0": "a", "img1": "b", "K0": K.tolist(), "K1": K.tolist(),
         "R": R.tolist(), "t": t.tolist()}
        for _ in range(3)
    ]

    def good_matcher(_, __):
        return p0 + rng.randn(*p0.shape) * 0.2, \
            p1 + rng.randn(*p1.shape) * 0.2

    res = megadepth.evaluate_pairs(good_matcher, pairs,
                                   ransac_threshold_px=1.5,
                                   num_hypotheses=512)
    assert res["auc@5"] > 0.5, res
    assert res["median_err_deg"] < 2.0

    def bad_matcher(_, __):
        return (rng.uniform(0, 640, (100, 2)).astype(np.float32),
                rng.uniform(0, 480, (100, 2)).astype(np.float32))

    res_bad = megadepth.evaluate_pairs(bad_matcher, pairs,
                                       ransac_threshold_px=1.5,
                                       num_hypotheses=256)
    assert res_bad["auc@5"] < 0.3


def test_match_dense_batch_pipeline(tmp_path):
    """Batch dense matching writes aggregated keypoints + matches HDF5
    (reference call stack: match_dense.main → match_and_assign)."""
    from imcui_tpu.pipeline import match_dense
    from imcui_tpu.utils.io import get_keypoints, get_matches, list_h5_names

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    shutil.copy("/root/reference/tests/data/02928139_3448003521.jpg",
                img_dir / "a.jpg")
    shutil.copy("/root/reference/tests/data/17295357_9106075285.jpg",
                img_dir / "b.jpg")
    pairs = tmp_path / "pairs.txt"
    pairs.write_text("a.jpg b.jpg\n")

    conf = {
        "output": "matches-loftr-test",
        "model": {"name": "loftr", "weights": "outdoor",
                  "max_keypoints": 128, "match_threshold": 0.0},
        "preprocessing": {"grayscale": True, "resize_max": 128,
                          "dfactor": 8},
        "max_error": 1,
        "cell_size": 1,
    }
    feats, matches = match_dense.main(
        conf, pairs, img_dir, export_dir=tmp_path, max_kps=256,
    )
    assert feats.exists() and matches.exists()
    names = sorted(list_h5_names(feats))
    assert names == ["a.jpg", "b.jpg"]
    kp_a = get_keypoints(feats, "a.jpg")
    kp_b = get_keypoints(feats, "b.jpg")
    assert kp_a.ndim == 2 and kp_a.shape[1] == 2
    m, sc = get_matches(matches, "a.jpg", "b.jpg")
    if len(m):
        assert m[:, 0].max() < len(kp_a)
        assert m[:, 1].max() < len(kp_b)
