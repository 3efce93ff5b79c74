"""Relative-pose AUC through the FULL on-device chain (VERDICT r4 #2).

The north-star metric is MegaDepth-1500 pose AUC (BASELINE.md); no
dataset egress exists here, so eval/synthpose manufactures calibrated
pairs with planted (K, R, t) from held-out photos and the chain under
test is exactly the real one: match -> ops/ransac fundamental RANSAC ->
essential -> pose recovery -> AUC@5/10/20 (eval/megadepth). Three
layers of evidence, each asserting offline today:

1. planted GT matches close the geometry chain to sub-degree error;
2. the renderer's pairs are matchable: SIFT+MNN clears a real AUC bar;
3. the locally TRAINED flagship (superpoint_adapted + lightglue
   selftrained) clears the same bar once its checkpoints exist.
"""

import pathlib

import numpy as np
import pytest

from imcui_tpu.eval import synthpose

GATE_IMG = pathlib.Path("/root/reference/tests/data/02928139_3448003521.jpg")
WEIGHTS = pathlib.Path(__file__).resolve().parents[1] / "weights"
SP_TRAINED = WEIGHTS / "superpoint_adapted.npz"
LG_TRAINED = WEIGHTS / "lightglue_selftrained.npz"


def test_pose_chain_on_planted_matches():
    """GT correspondences -> fundamental RANSAC -> essential -> pose
    must close to sub-degree error (validates ops/ransac + ops/pose
    against analytically planted geometry, independent of any model)."""
    import jax
    import jax.numpy as jnp

    from imcui_tpu.ops import pose as pose_ops

    rng = np.random.default_rng(0)
    w, h = 640, 480
    for trial in range(3):
        scene = synthpose.sample_scene(rng, w, h)
        u0, u1 = synthpose.gt_correspondences(scene, w, h, rng, n=512)
        n = len(u0)
        assert n >= 200, n
        p0 = np.zeros((512, 2), np.float32)
        p1 = np.zeros((512, 2), np.float32)
        m = np.zeros(512, bool)
        p0[:n], p1[:n], m[:n] = u0, u1, True
        K = jnp.asarray(scene["K"], jnp.float32)
        out = pose_ops.estimate_pose(
            jax.random.PRNGKey(trial), jnp.asarray(p0), jnp.asarray(p1),
            jnp.asarray(m), K, K, threshold_px=0.75, num_hypotheses=2048)
        err = float(pose_ops.pose_error(
            out["R"], out["t"], jnp.asarray(scene["R"], jnp.float32),
            jnp.asarray(scene["t"], jnp.float32)))
        assert err < 1.5, (trial, err)


def test_renderer_geometry_consistency():
    """The z-buffered renderer must agree with the analytic GT map:
    view-1 intensity at the GT image of a view-0 point equals the
    view-0 intensity there (away from occlusion boundaries)."""
    import cv2

    img = cv2.imread(str(GATE_IMG), cv2.IMREAD_GRAYSCALE)
    img = cv2.resize(img, (640, 480))
    rng = np.random.default_rng(1)
    scene = synthpose.sample_scene(rng, 640, 480)
    img1, valid = synthpose.render_view1(img, scene)
    assert valid.mean() > 0.5, valid.mean()
    u0, u1 = synthpose.gt_correspondences(scene, 640, 480, rng, n=400)
    xi0 = np.round(u0).astype(int)
    xi1 = np.round(u1).astype(int)
    inb = ((xi1[:, 0] >= 0) & (xi1[:, 0] < 640)
           & (xi1[:, 1] >= 0) & (xi1[:, 1] < 480))
    xi0, xi1 = xi0[inb], xi1[inb]
    ok = valid[xi1[:, 1], xi1[:, 0]]
    v0 = img[xi0[:, 1], xi0[:, 0]].astype(float)
    v1 = img1[xi1[:, 1], xi1[:, 0]].astype(float)
    # rounding to integer pixels + bilinear resampling costs a few grey
    # levels; occluded GT points (back plane) are excluded by `ok`
    diff = np.abs(v0 - v1)[ok]
    assert ok.mean() > 0.6, ok.mean()
    assert np.median(diff) < 12.0, np.median(diff)


@pytest.fixture(scope="module")
def synth_pairs(tmp_path_factory):
    out = tmp_path_factory.mktemp("synthpose")
    return synthpose.generate_pairs(
        [GATE_IMG], out, n_pose_per_image=3, size=(480, 640), seed=0)


def _eval(pairs, matcher, **kw):
    from imcui_tpu.eval.megadepth import evaluate_matcher

    return evaluate_matcher(pairs, matcher,
                            ransac_threshold_px=kw.pop(
                                "ransac_threshold_px", 0.75), **kw)


def test_pose_auc_sift(synth_pairs):
    """Weight-free anchor: SIFT+MNN must clear a real AUC bar TODAY
    (measured 0.86/0.93/0.97 @5/10/20 over the 6-pair smoke; the bar
    leaves slack for pose-draw variance)."""
    assert len(synth_pairs) >= 2
    res = _eval(synth_pairs, "sift")
    assert res["auc@20"] >= 0.5, res
    assert res["median_err_deg"] <= 10.0, res


def test_pose_auc_trained_flagship(synth_pairs):
    """The fully learned flagship (locally trained SuperPoint teacher +
    locally trained LightGlue) through the same chain. The gate photo
    is excluded from both training corpora (weights/README.md), so this
    is a genuine held-out pose eval.

    Operating point (measured r5, BASELINE.md "Pose AUC"): subpixel
    soft-argmax peaks — the cell-grid decode's integer quantisation
    dominated pose error (12.9° median → 4.8°) — and a 1.5 px RANSAC
    threshold matched to the trained detector's localisation noise
    (SIFT's subpixel DoG peaks support 0.75 px; measured AUC@5/10/20 =
    0.471/0.728/0.864 at this point)."""
    if not (SP_TRAINED.exists() and LG_TRAINED.exists()):
        pytest.skip("locally trained checkpoints not present")
    res = _eval(synth_pairs, "superpoint+lightglue",
                ransac_threshold_px=1.5,
                feature_opts={"subpixel": True,
                              "keypoint_threshold": 5e-4},
                matcher_opts={"match_threshold": 0.1})
    assert res["auc@20"] >= 0.5, res
    assert res["median_err_deg"] <= 10.0, res
