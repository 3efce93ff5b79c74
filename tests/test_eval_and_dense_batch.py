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


def test_scene_info_conversion_and_api_glue(tmp_path, rng):
    """The MegaDepth plumbing that only runs on real data elsewhere:
    convert_scene_info (upstream scene_info npz → pair JSON with correct
    relative poses) and api_matcher_fn (ImageMatchingAPI adapter) driven
    end-to-end through evaluate_pairs on disk images. Pose accuracy is
    gated by test_eval_harness_synthetic; this pins that the full
    file-in/metrics-out path executes."""
    import cv2

    from imcui_tpu.api.core import ImageMatchingAPI
    from imcui_tpu.eval import megadepth

    # --- synthetic upstream-format scene_info npz ---
    K = np.array([[400.0, 0, 96], [0, 400.0, 64], [0, 0, 1]])
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[:3, 3] = [0.2, 0.0, 0.05]
    img_root = tmp_path / "imgs"
    img_root.mkdir()
    img = (rng.rand(128, 192, 3) * 255).astype(np.uint8)
    # blur for SIFT-able texture, shift for the second view
    img = cv2.GaussianBlur(img, (0, 0), 2.0)
    cv2.imwrite(str(img_root / "a.jpg"), img)
    cv2.imwrite(str(img_root / "b.jpg"), np.roll(img, 5, axis=1))
    npz = tmp_path / "scene.npz"
    np.savez(
        npz,
        pair_infos=np.array([(np.array([0, 1]), 0.5, None)],
                            dtype=object),
        poses=np.stack([T0, T1]),
        intrinsics=np.stack([K, K]),
        image_paths=np.array(["a.jpg", "b.jpg"]),
    )
    out_json = tmp_path / "pairs.json"
    pairs = megadepth.convert_scene_info(npz, img_root, out_json)
    assert len(pairs) == 1
    T_0to1 = np.asarray(pairs[0]["R"]), np.asarray(pairs[0]["t"])
    np.testing.assert_allclose(T_0to1[0], np.eye(3), atol=1e-9)
    np.testing.assert_allclose(T_0to1[1], T1[:3, 3], atol=1e-9)
    assert json.load(open(out_json))[0]["img0"].endswith("a.jpg")

    # --- API glue: weight-free sift+NN through evaluate_pairs ---
    conf = {
        "feature": {
            "output": "feats-sift",
            "model": {"name": "sift", "max_keypoints": 512},
            "preprocessing": {"grayscale": True, "resize_max": 192,
                              "dfactor": 8},
        },
        "matcher": {
            "output": "matches-NN-mutual",
            "model": {"name": "nearest_neighbor", "do_mutual_check": True,
                      "match_threshold": 0.2},
        },
        "dense": False, "standalone": False,
    }
    api = ImageMatchingAPI(conf=conf)
    res = megadepth.evaluate_pairs(
        megadepth.api_matcher_fn(api), pairs, ransac_threshold_px=2.0,
        num_hypotheses=128)
    assert set(res) >= {"auc@5", "auc@10", "auc@20", "median_err_deg",
                        "mean_matches", "errors"}
    assert res["mean_matches"] > 8  # textured roll-pair must match


def test_match_images_mismatched_aspect(rng):
    """Dense matchers stack/vmap both towers in one program, so two
    views landing in DIFFERENT padding buckets must be padded to the
    union canvas (caught driving the API on the real two-view pair,
    r5). Portrait + landscape inputs through the full dense path."""
    from imcui_tpu.models import matchers
    from imcui_tpu.pipeline import match_dense
    from imcui_tpu.utils.base_model import dynamic_load

    conf = {
        "model": {"name": "loftr", "max_keypoints": 64,
                  "match_threshold": 0.0, "precision": "fp32"},
        "preprocessing": {"grayscale": True, "resize_max": 96,
                          "dfactor": 8},
    }
    model = dynamic_load(matchers, "loftr")(conf["model"])
    img0 = (rng.rand(96, 64, 3) * 255).astype(np.uint8)   # portrait
    img1 = (rng.rand(64, 96, 3) * 255).astype(np.uint8)   # landscape
    pred = match_dense.match_images(model, img0, img1, conf)
    k0 = np.asarray(pred["keypoints0_orig"])
    k1 = np.asarray(pred["keypoints1_orig"])
    assert k0.shape == k1.shape and k0.shape[-1] == 2
    # keypoints must stay inside each ORIGINAL frame (the masks carry
    # the valid sizes through the padded canvas)
    if len(k0):
        assert (k0[:, 0] <= 64).all() and (k0[:, 1] <= 96).all()
        assert (k1[:, 0] <= 96).all() and (k1[:, 1] <= 64).all()
