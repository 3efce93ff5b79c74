"""PnP RANSAC tests on synthetic camera geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from imcui_tpu.ops import pnp, pose


def make_scene(rng, n_in=80, n_out=40, noise=0.5):
    K = np.array([[900.0, 0, 480], [0, 900.0, 360], [0, 0, 1]])
    angle = 0.4
    R = np.array(
        [
            [np.cos(angle), -np.sin(angle), 0],
            [np.sin(angle), np.cos(angle), 0],
            [0, 0, 1],
        ]
    ) @ np.array(
        [
            [1, 0, 0],
            [0, np.cos(0.2), -np.sin(0.2)],
            [0, np.sin(0.2), np.cos(0.2)],
        ]
    )
    t = np.array([0.3, -0.2, 4.0])
    X = rng.uniform(-3, 3, (n_in, 3)) + np.array([0, 0, 2.0])
    Xc = X @ R.T + t
    x = Xc @ K.T
    pts2d = x[:, :2] / x[:, 2:]
    pts2d += rng.randn(n_in, 2) * noise
    # outliers: random 2D locations
    X_out = rng.uniform(-3, 3, (n_out, 3)) + np.array([0, 0, 2.0])
    p_out = rng.uniform(0, 900, (n_out, 2))
    pts2d = np.concatenate([pts2d, p_out]).astype(np.float32)
    X_all = np.concatenate([X, X_out]).astype(np.float32)
    return K, R, t, pts2d, X_all, n_in


def test_pnp_recovers_pose(rng):
    K, R_gt, t_gt, p2d, p3d, n_in = make_scene(rng)
    mask = np.ones(len(p2d), bool)
    out = pnp.ransac_pnp(
        jax.random.PRNGKey(0), jnp.asarray(p2d), jnp.asarray(p3d),
        jnp.asarray(mask), jnp.asarray(K, dtype=jnp.float32),
        threshold_px=4.0, num_hypotheses=512,
    )
    assert bool(out["success"])
    inl = np.asarray(out["inliers"])
    assert inl[:n_in].sum() >= 0.9 * n_in
    assert inl[n_in:].sum() <= 3
    rot_err = float(pose.rotation_angle_deg(out["R"], jnp.asarray(R_gt)))
    t_err = float(np.linalg.norm(np.asarray(out["t"]) - t_gt))
    assert rot_err < 2.0, rot_err
    assert t_err < 0.2, t_err


def test_pnp_respects_mask(rng):
    K, R_gt, t_gt, p2d, p3d, n_in = make_scene(rng, n_out=0)
    pad2 = rng.uniform(0, 900, (32, 2)).astype(np.float32)
    pad3 = rng.uniform(-3, 3, (32, 3)).astype(np.float32)
    p2 = np.concatenate([p2d, pad2])
    p3 = np.concatenate([p3d, pad3])
    mask = np.concatenate([np.ones(len(p2d), bool), np.zeros(32, bool)])
    out = pnp.ransac_pnp(
        jax.random.PRNGKey(1), jnp.asarray(p2), jnp.asarray(p3),
        jnp.asarray(mask), jnp.asarray(K, dtype=jnp.float32),
        threshold_px=4.0, num_hypotheses=256,
    )
    inl = np.asarray(out["inliers"])
    assert not inl[len(p2d):].any()
    assert inl[:n_in].sum() >= 0.9 * n_in


def test_pnp_too_few_points(rng):
    K = np.eye(3) * 500.0
    K[2, 2] = 1
    p2 = rng.rand(16, 2).astype(np.float32) * 100
    p3 = rng.rand(16, 3).astype(np.float32)
    mask = np.zeros(16, bool)
    mask[:4] = True  # < 6 minimal
    out = pnp.ransac_pnp(
        jax.random.PRNGKey(2), jnp.asarray(p2), jnp.asarray(p3),
        jnp.asarray(mask), jnp.asarray(K, dtype=jnp.float32),
        num_hypotheses=64,
    )
    assert not bool(out["success"])
