"""Two-view pose recovery + pose-error metrics, fully on-device.

Supports the MegaDepth-1500 style evaluation (pose AUC@5°/10°/20°) that the
rebuild uses as its accuracy north star (BASELINE.md). The reference has no
in-repo pose estimation — it stops at F/H + OpenCV recoverPose-equivalents
live in pycolmap/cv2; here the whole chain (essential fit → decomposition →
cheirality → angular errors) is jittable JAX so a full eval batch runs as
one XLA program.
"""

import jax
import jax.numpy as jnp

from .ransac import (fundamental_8pt, highest_precision, ransac,  # noqa: F401
                     sampson_error)


@highest_precision
def essential_from_fundamental(F, K0, K1):
    """E = K1ᵀ F K0, projected onto the essential manifold (σ1=σ2, σ3=0)."""
    E = K1.T @ F @ K0
    U, S, Vt = jnp.linalg.svd(E)
    s = (S[0] + S[1]) / 2.0
    return (U * jnp.array([s, s, 0.0])[None, :]) @ Vt


@highest_precision
def decompose_essential(E):
    """Four candidate (R, t) from E. Returns Rs (4,3,3), ts (4,3)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _triangulate_depths(R, t, x0, x1):
    """Mid-point style depths for cheirality. x0/x1: (N, 3) unit-plane rays
    (K-normalised homogeneous). Returns depths in both cameras (N,), (N,)."""
    # x1 ~ R x0 d0 + t  → solve [R x0, -x1] [d0, d1]ᵀ = -t per point (lstsq 2x2)
    Rx0 = x0 @ R.T
    a = jnp.sum(Rx0 * Rx0, -1)
    b = -jnp.sum(Rx0 * x1, -1)
    c = jnp.sum(x1 * x1, -1)
    rhs0 = -jnp.sum(Rx0 * t[None, :], -1)
    rhs1 = jnp.sum(x1 * t[None, :], -1)
    det = a * c - b * b
    d0 = (c * rhs0 - b * rhs1) / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    d1 = (a * rhs1 - b * rhs0) / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    return d0, d1


@highest_precision
def recover_pose(E, pts0, pts1, K0, K1, mask=None):
    """Choose the (R, t) with the most points in front of both cameras
    (cv2.recoverPose analog, vectorised over the 4 candidates)."""
    def normalize(p, K):
        ph = jnp.concatenate([p, jnp.ones_like(p[:, :1])], -1)
        return ph @ jnp.linalg.inv(K).T

    x0 = normalize(pts0, K0)
    x1 = normalize(pts1, K1)
    if mask is None:
        mask = jnp.ones(pts0.shape[0], bool)
    Rs, ts = decompose_essential(E)

    def count(R, t):
        d0, d1 = _triangulate_depths(R, t, x0, x1)
        ok = (d0 > 0) & (d1 > 0) & mask
        return ok.sum()

    counts = jax.vmap(count)(Rs, ts)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], counts[best]


@highest_precision
def rotation_angle_deg(R_est, R_gt):
    """Geodesic rotation error in degrees."""
    cos = (jnp.trace(R_est.T @ R_gt) - 1.0) / 2.0
    cos = jnp.clip(cos, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def translation_angle_deg(t_est, t_gt):
    """Angular error between translation directions in degrees (sign
    ambiguity resolved by taking the min)."""
    t_est = t_est / jnp.maximum(jnp.linalg.norm(t_est), 1e-12)
    t_gt = t_gt / jnp.maximum(jnp.linalg.norm(t_gt), 1e-12)
    cos = jnp.clip(jnp.abs(jnp.dot(t_est, t_gt)), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def pose_error(R_est, t_est, R_gt, t_gt):
    """max(rotation err, translation err) in degrees — the MegaDepth metric."""
    return jnp.maximum(
        rotation_angle_deg(R_est, R_gt), translation_angle_deg(t_est, t_gt)
    )


def pose_auc(errors, thresholds=(5.0, 10.0, 20.0)):
    """Pose AUC at the given thresholds (numpy-side; errors: array (B,))."""
    import numpy as np

    errors = np.sort(np.asarray(errors))
    recall = (np.arange(len(errors)) + 1) / len(errors)
    errors = np.concatenate([[0.0], errors])
    recall = np.concatenate([[0.0], recall])
    aucs = []
    for t in thresholds:
        last_index = np.searchsorted(errors, t)
        r = np.concatenate([recall[:last_index], [recall[max(last_index - 1, 0)]]])
        e = np.concatenate([errors[:last_index], [t]])
        aucs.append(float(np.trapz(r, x=e) / t))
    return aucs


def estimate_pose(key, pts0, pts1, mask, K0, K1, threshold_px=1.0,
                  num_hypotheses=2048):
    """End-to-end two-view relative pose: fundamental RANSAC → essential →
    decomposition. All on-device; jittable."""
    out = ransac(
        key, pts0, pts1, mask, model="fundamental",
        threshold=threshold_px, num_hypotheses=num_hypotheses,
    )
    E = essential_from_fundamental(out["M"], K0, K1)
    R, t, _ = recover_pose(E, pts0, pts1, K0, K1, mask=out["inliers"])
    return {"R": R, "t": t, **out}
