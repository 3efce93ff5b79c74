"""RANSAC + pose recovery tests on synthetic geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from imcui_tpu.ops import pose, ransac


def make_homography_scene(rng, n_in=80, n_out=40, noise=0.5):
    H = np.array(
        [[1.1, 0.05, 20.0], [-0.03, 0.95, -10.0], [1e-4, -5e-5, 1.0]]
    )
    pts0 = rng.uniform(50, 950, (n_in + n_out, 2))
    ph = np.concatenate([pts0, np.ones((len(pts0), 1))], 1)
    q = ph @ H.T
    pts1 = q[:, :2] / q[:, 2:]
    pts1[:n_in] += rng.randn(n_in, 2) * noise
    pts1[n_in:] = rng.uniform(0, 1000, (n_out, 2))  # outliers
    return H, pts0.astype(np.float32), pts1.astype(np.float32)


def test_homography_ransac_recovers_model(rng):
    H_gt, pts0, pts1 = make_homography_scene(rng)
    n = len(pts0)
    mask = np.ones(n, bool)
    out = ransac.ransac(
        jax.random.PRNGKey(0), jnp.asarray(pts0), jnp.asarray(pts1),
        jnp.asarray(mask), model="homography", threshold=3.0,
        num_hypotheses=512,
    )
    H = np.asarray(out["M"])
    H = H / H[2, 2]
    inliers = np.asarray(out["inliers"])
    assert inliers[:80].sum() >= 75  # finds the true inliers
    assert inliers[80:].sum() <= 4  # rejects outliers
    # reprojection agreement on a grid
    test = np.array([[100.0, 100.0], [800.0, 200.0], [400.0, 900.0]])
    for M in (H_gt, H):
        pass
    th = np.concatenate([test, np.ones((3, 1))], 1)
    p_gt = th @ H_gt.T
    p_gt = p_gt[:, :2] / p_gt[:, 2:]
    p_est = th @ H.T
    p_est = p_est[:, :2] / p_est[:, 2:]
    assert np.abs(p_gt - p_est).max() < 2.0


def make_two_view_scene(rng, n_in=120, n_out=60, noise=0.5):
    K = np.array([[800.0, 0, 500], [0, 800.0, 400], [0, 0, 1]])
    # random-ish rotation + translation
    angle = 0.3
    R = np.array(
        [
            [np.cos(angle), 0, np.sin(angle)],
            [0, 1, 0],
            [-np.sin(angle), 0, np.cos(angle)],
        ]
    )
    t = np.array([1.0, 0.2, 0.1])
    t = t / np.linalg.norm(t)
    X = rng.uniform(-2, 2, (n_in, 3)) + np.array([0, 0, 6.0])
    x0 = X @ K.T
    pts0 = x0[:, :2] / x0[:, 2:]
    Xc1 = X @ R.T + t
    x1 = Xc1 @ K.T
    pts1 = x1[:, :2] / x1[:, 2:]
    pts0 = pts0 + rng.randn(n_in, 2) * noise
    pts1 = pts1 + rng.randn(n_in, 2) * noise
    # outliers
    o0 = rng.uniform(100, 900, (n_out, 2))
    o1 = rng.uniform(100, 900, (n_out, 2))
    pts0 = np.concatenate([pts0, o0]).astype(np.float32)
    pts1 = np.concatenate([pts1, o1]).astype(np.float32)
    return K, R, t, pts0, pts1, n_in


def test_fundamental_ransac_and_pose(rng):
    K, R_gt, t_gt, pts0, pts1, n_in = make_two_view_scene(rng)
    mask = np.ones(len(pts0), bool)
    out = pose.estimate_pose(
        jax.random.PRNGKey(1), jnp.asarray(pts0), jnp.asarray(pts1),
        jnp.asarray(mask), jnp.asarray(K, dtype=jnp.float32),
        jnp.asarray(K, dtype=jnp.float32),
        threshold_px=2.0, num_hypotheses=1024,
    )
    inliers = np.asarray(out["inliers"])
    assert inliers[:n_in].sum() >= 0.85 * n_in
    err = float(
        pose.pose_error(out["R"], out["t"], jnp.asarray(R_gt),
                        jnp.asarray(t_gt))
    )
    assert err < 5.0, f"pose error {err} deg"


def test_ransac_respects_mask(rng):
    H_gt, pts0, pts1 = make_homography_scene(rng, n_in=60, n_out=0)
    # append garbage marked invalid — result must not change materially
    pad0 = rng.uniform(0, 1000, (40, 2)).astype(np.float32)
    pad1 = rng.uniform(0, 1000, (40, 2)).astype(np.float32)
    p0 = np.concatenate([pts0, pad0])
    p1 = np.concatenate([pts1, pad1])
    mask = np.concatenate([np.ones(60, bool), np.zeros(40, bool)])
    out = ransac.ransac(
        jax.random.PRNGKey(2), jnp.asarray(p0), jnp.asarray(p1),
        jnp.asarray(mask), model="homography", threshold=3.0,
        num_hypotheses=256,
    )
    inliers = np.asarray(out["inliers"])
    assert not inliers[60:].any()
    assert inliers[:60].sum() >= 55


def test_pose_auc_sanity():
    errors = np.array([1.0, 3.0, 8.0, 15.0, 50.0])
    aucs = pose.pose_auc(errors, thresholds=(5.0, 10.0, 20.0))
    assert 0 < aucs[0] < aucs[1] < aucs[2] < 1


def test_ransac_quality_vs_opencv(rng):
    """Head-to-head with OpenCV's USAC_MAGSAC (the reference's default
    estimator) on identical contaminated correspondence sets: the
    on-device estimator must recover models of comparable quality
    (within 1.5x the OpenCV ground-truth-inlier reprojection error) for
    both homography and fundamental geometry."""
    import cv2
    import jax

    from imcui_tpu.ops import ransac as ransac_ops

    n_in, n_out = 150, 100
    # ground-truth homography scene
    H_gt = np.array([[1.1, 0.08, 14.0], [-0.05, 0.97, -9.0],
                     [1.5e-4, -8e-5, 1.0]])
    p0 = rng.uniform(40, 600, (n_in, 2)).astype(np.float64)
    ph = np.concatenate([p0, np.ones((n_in, 1))], 1) @ H_gt.T
    p1 = ph[:, :2] / ph[:, 2:]
    p0 = np.concatenate([p0, rng.uniform(0, 640, (n_out, 2))])
    p1 = np.concatenate([p1 + rng.randn(n_in, 2) * 0.4,
                         rng.uniform(0, 640, (n_out, 2))])
    order = rng.permutation(len(p0))
    p0, p1 = p0[order].astype(np.float32), p1[order].astype(np.float32)
    gt_inlier = order < n_in

    Hcv, mask_cv = cv2.findHomography(
        p0, p1, cv2.USAC_MAGSAC, 3.0, confidence=0.9999, maxIters=5000)

    out = ransac_ops.ransac(
        jax.random.PRNGKey(0), jnp.asarray(p0), jnp.asarray(p1),
        jnp.ones(len(p0), bool), model="homography", threshold=3.0,
        num_hypotheses=1024)
    H_tpu = np.asarray(out["M"], np.float64)

    def reproj_err(H):
        q = np.concatenate([p0[gt_inlier],
                            np.ones((n_in, 1), np.float32)], 1) @ H.T
        q = q[:, :2] / q[:, 2:]
        return float(np.median(np.linalg.norm(q - p1[gt_inlier], axis=1)))

    e_cv, e_tpu = reproj_err(Hcv), reproj_err(H_tpu)
    assert e_tpu < max(1.5 * e_cv, 1.0), (e_tpu, e_cv)
    assert int(out["num_inliers"]) > 0.8 * n_in

    # fundamental: same scene viewed as epipolar geometry via a known
    # camera motion
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    ang = 0.25
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    t = np.array([1.0, 0.15, 0.1]); t /= np.linalg.norm(t)
    X = rng.uniform(-2, 2, (n_in, 3)) + np.array([0, 0, 6.0])
    x0 = X @ K.T; f0 = (x0[:, :2] / x0[:, 2:])
    X1 = X @ R.T + t
    x1 = X1 @ K.T; f1 = (x1[:, :2] / x1[:, 2:])
    f0 = np.concatenate([f0, rng.uniform(0, 640, (n_out, 2))])
    f1 = np.concatenate([f1 + rng.randn(n_in, 2) * 0.3,
                         rng.uniform(0, 640, (n_out, 2))])
    f0, f1 = f0.astype(np.float32), f1.astype(np.float32)

    Fcv, _ = cv2.findFundamentalMat(
        f0, f1, cv2.USAC_MAGSAC, 2.0, confidence=0.9999, maxIters=5000)
    out = ransac_ops.ransac(
        jax.random.PRNGKey(1), jnp.asarray(f0), jnp.asarray(f1),
        jnp.ones(len(f0), bool), model="fundamental", threshold=2.0,
        num_hypotheses=1024)
    F_tpu = np.asarray(out["M"], np.float64)

    def sampson(F):
        a = np.concatenate([f0[:n_in], np.ones((n_in, 1), np.float32)], 1)
        b = np.concatenate([f1[:n_in], np.ones((n_in, 1), np.float32)], 1)
        Fa = a @ F.T
        Fb = b @ F
        num = np.abs(np.sum(b * (a @ F.T), 1))
        den = np.sqrt(Fa[:, 0] ** 2 + Fa[:, 1] ** 2
                      + Fb[:, 0] ** 2 + Fb[:, 1] ** 2)
        return float(np.median(num / np.maximum(den, 1e-9)))

    e_cv, e_tpu = sampson(Fcv), sampson(F_tpu)
    assert e_tpu < max(1.5 * e_cv, 0.8), (e_tpu, e_cv)
    assert int(out["num_inliers"]) > 0.7 * n_in
