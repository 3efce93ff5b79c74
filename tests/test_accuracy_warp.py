"""Offline accuracy gate (VERDICT r1 item 5): known-homography warps of a
real photo, measured end-to-end through ImageMatchingAPI.

Weight-free pipelines must clear real recall/precision bars TODAY.
Learned models auto-enroll: each case declares whether it needs
pretrained weights; without them (no egress here) it is skipped, and the
moment a conversion starts loading real weights the bar applies.
"""

import pathlib

import numpy as np
import pytest

from imcui_tpu.api.core import ImageMatchingAPI
from imcui_tpu.eval.warp import evaluate_warp
from imcui_tpu.utils.image import read_image

IMG = "/root/reference/tests/data/02928139_3448003521.jpg"

# Locally trained checkpoints (weights/README.md): produced by
# `imcui-tpu train` inside this repo — the gate photo (and its rot/scale
# derivatives) is excluded from the training corpus, so these cases are
# genuine held-out evals that ASSERT offline today.
WEIGHTS = pathlib.Path(__file__).resolve().parents[1] / "weights"
SP_TRAINED = WEIGHTS / "superpoint_adapted.npz"
LG_TRAINED = WEIGHTS / "lightglue_selftrained.npz"
LOFTR_TRAINED = WEIGHTS / "loftr_selftrained.npz"


def _trained_loftr_conf():
    """Locally trained dense matcher (homography training at 320 px —
    weights/README.md): the dense-tier learned pipeline."""
    return {
        "matcher": {
            "output": "matches-loftr",
            "model": {"name": "loftr", "max_keypoints": 1024,
                      "match_threshold": 0.2,
                      "checkpoint_npz": str(LOFTR_TRAINED)},
            "preprocessing": {"grayscale": True, "resize_max": 320,
                              "dfactor": 8},
        },
        "dense": True, "standalone": True,
    }


def _trained_flagship_conf():
    """Adapted SuperPoint + locally trained LightGlue — the fully
    learned flagship pipeline (VERDICT r4 #1)."""
    conf = _sparse_conf("superpoint", "lightglue",
                        keypoint_threshold=5e-4,
                        checkpoint_npz=str(SP_TRAINED))
    conf["matcher"]["output"] = "matches-lightglue"
    conf["matcher"]["model"] = {
        "name": "lightglue", "features": "superpoint",
        "match_threshold": 0.1, "checkpoint_npz": str(LG_TRAINED),
    }
    return conf


def _sparse_conf(feature_name, matcher_name="nearest_neighbor", **feat):
    return {
        "feature": {
            "output": f"feats-{feature_name}",
            "model": {"name": feature_name, "max_keypoints": 1024, **feat},
            "preprocessing": {"grayscale": True, "resize_max": 480,
                              "dfactor": 8},
        },
        "matcher": {
            "output": "matches-NN-mutual",
            "model": {"name": matcher_name, "do_mutual_check": True},
        },
        "dense": False,
        "standalone": False,
    }


# (case id, conf builder, needs_pretrained, min_recall, max_corner_err)
CASES = [
    ("sift+mnn", lambda: _sparse_conf("sift"), False, 0.7, 5.0),
    ("rootsift+mnn",
     lambda: _sparse_conf("dog", descriptor="rootsift"), False, 0.7, 5.0),
    ("sift+adalam", lambda: _sparse_conf("sift", "adalam"),
     False, 0.7, 5.0),
    ("superpoint+mnn", lambda: _sparse_conf(
        "superpoint", keypoint_threshold=1e-4), True, 0.6, 8.0),
    # learned pipeline asserting TODAY on the locally trained detector
    # (synthetic stage + homographic adaptation; weights/README.md)
    ("superpoint_trained+mnn", lambda: _sparse_conf(
        "superpoint", keypoint_threshold=5e-4,
        checkpoint_npz=str(SP_TRAINED)), False, 0.85, 3.0),
    # the fully learned flagship: trained detector + trained matcher
    # (LightGlue homography pre-training on the same held-out-safe
    # corpus; VERDICT r4 #1 "Done =" bar)
    ("superpoint_trained+lightglue_trained", _trained_flagship_conf,
     False, 0.85, 3.0),
    # the learned dense tier: locally trained LoFTR (r5; measured
    # held-out 0.999 recall / 0.33 px — weights/README.md)
    ("loftr_trained", _trained_loftr_conf, False, 0.9, 2.0),
    # enrolled learned pipelines: the bar arms the moment a conversion
    # reports pretrained weights (VERDICT r2 #8)
    ("dog+sosnet+mnn",
     lambda: _sparse_conf("dog", descriptor="sosnet"), True, 0.6, 8.0),
    ("dog+hardnet+mnn",
     lambda: _sparse_conf("dog", descriptor="hardnet"), True, 0.6, 8.0),
    ("disk+mnn", lambda: _sparse_conf("disk"), True, 0.5, 8.0),
    ("aliked+mnn", lambda: _sparse_conf(
        "aliked", detection_threshold=0.0), True, 0.5, 8.0),
    ("alike+mnn", lambda: _sparse_conf(
        "alike", detection_threshold=0.0), True, 0.5, 8.0),
    ("xfeat+mnn", lambda: _sparse_conf(
        "xfeat", keypoint_threshold=0.0), True, 0.5, 8.0),
    ("r2d2+mnn", lambda: _sparse_conf(
        "r2d2", reliability_threshold=0.0, repetability_threshold=0.0),
     True, 0.5, 8.0),
]


@pytest.fixture(scope="module")
def photo():
    img = read_image(IMG)
    import cv2

    h, w = img.shape[:2]
    s = 480.0 / max(h, w)
    return cv2.resize(img, (int(w * s), int(h * s)))


@pytest.mark.parametrize(
    "name,conf_fn,needs_pretrained,min_recall,max_err",
    CASES, ids=[c[0] for c in CASES])
def test_warp_accuracy(name, conf_fn, needs_pretrained, min_recall,
                       max_err, photo):
    if name == "loftr_trained":
        if not LOFTR_TRAINED.exists():
            pytest.skip("locally trained loftr checkpoint not present")
    elif "_trained" in name and not SP_TRAINED.exists():
        pytest.skip("locally trained checkpoint not present")
    if "lightglue_trained" in name and not LG_TRAINED.exists():
        pytest.skip("locally trained lightglue checkpoint not present")
    api = ImageMatchingAPI(conf=conf_fn())
    if needs_pretrained:
        metas = [m for m in (getattr(api.extractor, "meta", None),
                             getattr(api.matcher, "meta", None))
                 if m is not None]
        if not all(m.get("pretrained") for m in metas):
            pytest.skip(f"{name}: pretrained weights unavailable offline")
    results, agg = evaluate_warp(api, photo)
    assert agg["median_matches"] >= 20, (name, results)
    assert agg["median_recall"] >= min_recall, (name, agg, results)
    assert agg["median_h_corner_err"] <= max_err, (name, agg, results)


def _rotation_hs(w, h, angles):
    import cv2

    return [np.vstack([cv2.getRotationMatrix2D((w / 2, h / 2), a, s),
                       [0, 0, 1]]).astype(np.float64)
            for a, s in angles]


def test_warp_accuracy_rotation_sift(photo):
    """Large-rotation family (ui/examples.py's 45–315° battery): SIFT is
    the reference's rotation-robust anchor and must hold the bar at 90°
    steps and the hard 45° case."""
    api = ImageMatchingAPI(conf=_sparse_conf("sift"))
    h, w = photo.shape[:2]
    hs = _rotation_hs(w, h, [(45, 1.0), (90, 1.0), (180, 1.0),
                             (270, 1.0)])
    results, agg = evaluate_warp(api, photo, homographies=hs)
    assert agg["median_matches"] >= 20, results
    assert agg["median_recall"] >= 0.6, (agg, results)
    assert agg["median_h_corner_err"] <= 6.0, (agg, results)


def test_warp_accuracy_scale_sift(photo):
    """Scale family (ui/examples.py's 0.3/0.5 battery)."""
    api = ImageMatchingAPI(conf=_sparse_conf("sift"))
    h, w = photo.shape[:2]
    hs = _rotation_hs(w, h, [(0, 0.5), (0, 0.3)])
    results, agg = evaluate_warp(api, photo, homographies=hs)
    assert agg["median_matches"] >= 15, results
    assert agg["median_recall"] >= 0.5, (agg, results)


def test_line_matching_structural():
    """Synthetic line scene through the gluestick voting path (the
    sold2/gluestick line contract): translated self-pair must recover
    line matches and expose the line output keys (VERDICT r2 #8)."""
    rng = np.random.RandomState(0)
    img = np.zeros((192, 256), np.float32)
    img[40:43, 20:230] = 1.0
    img[40:150, 120:123] = 1.0
    img[120:123, 40:210] = 1.0
    img[150:153, 60:190] = 1.0
    img += 0.05 * rng.rand(192, 256).astype(np.float32)
    rgb = (np.clip(np.stack([img] * 3, -1), 0, 1) * 255).astype(np.uint8)
    shifted = np.roll(rgb, 6, axis=1)

    conf = {
        "matcher": {
            "output": "matches-gluestick",
            "model": {"name": "gluestick", "max_keypoints": 256,
                      "max_lines": 32, "match_threshold": 0.0},
            "preprocessing": {"grayscale": True, "resize_max": 256,
                              "dfactor": 8},
        },
        "dense": True, "standalone": True,
    }
    api = ImageMatchingAPI(conf=conf)
    pred = api(rgb, shifted)
    assert "line_keypoints0_orig" in pred or "lines0_orig" in pred or \
        "lines0" in pred, sorted(pred)
    lines0 = np.asarray(pred.get("lines0_orig", pred.get("lines0")))[0]
    lines1 = np.asarray(pred.get("lines1_orig", pred.get("lines1")))[0]
    assert lines0.shape == lines1.shape
    assert len(lines0) >= 2, len(lines0)
    # matched line midpoints must agree up to the known 6 px shift
    mid0 = lines0.reshape(len(lines0), 2, 2).mean(1)
    mid1 = lines1.reshape(len(lines1), 2, 2).mean(1)
    dx = mid1[:, 0] - mid0[:, 0]
    assert np.median(np.abs(dx - 6.0)) <= 4.0, dx
