"""On-device absolute-pose estimation (PnP + RANSAC).

The reference localises queries through ``pycolmap.absolute_pose_estimation``
(reference: imcui/hloc/localize_sfm.py:53-228) — a CPU C++ call per query.
Here the whole thing is batched JAX: DLT minimal solves for every
hypothesis at once, reprojection scoring as one (S, N) matrix, Procrustes
orthogonalisation for the winners, IRLS local optimisation. A batch of
queries vmaps on top.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .ransac import NEG_INF, highest_precision, solve_nullvec_fix_last

MIN_PNP_POINTS = 6


def _dlt_camera_matrices(x2d, X3d):
    """Batched DLT for P = [R|t] from normalised 2-D points.

    x2d: (S, m, 2) — K-normalised image points (unit plane)
    X3d: (S, m, 3) — world points
    Returns P: (S, 3, 4) up to scale (NOT orthogonalised).
    """
    X = jnp.concatenate([X3d, jnp.ones_like(X3d[..., :1])], -1)  # (S,m,4)
    u = x2d[..., 0:1]
    v = x2d[..., 1:2]
    zeros = jnp.zeros_like(X)
    rows_u = jnp.concatenate([X, zeros, -u * X], -1)  # (S, m, 12)
    rows_v = jnp.concatenate([zeros, X, -v * X], -1)
    A = jnp.concatenate([rows_u, rows_v], 1)  # (S, 2m, 12)
    p = solve_nullvec_fix_last(A)
    return p.reshape(-1, 3, 4)


def _orthogonalize(P, x2d, X3d):
    """Project the left 3×3 of P onto SO(3) (Procrustes) and fix scale/sign
    by cheirality. P: (3, 4) → R (3,3), t (3,)."""
    M = P[:, :3]
    U, S, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    R = U @ jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, det])) @ Vt
    scale = jnp.mean(S)
    t = P[:, 3] / jnp.maximum(scale, 1e-12)
    # cheirality: majority of points must have positive depth
    depths = X3d @ R[2] + t[2]
    flip = jnp.sum(depths < 0) > (depths.shape[0] // 2)
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    return R, t


def _reprojection_errors(P, x2d, X3d):
    """Squared reprojection error on the normalised plane.
    P: (S, 3, 4); x2d: (N, 2); X3d: (N, 3) → (S, N)."""
    X = jnp.concatenate([X3d, jnp.ones_like(X3d[:, :1])], -1)  # (N, 4)
    proj = jnp.einsum("sij,nj->sni", P, X,
                      preferred_element_type=jnp.float32)
    z = proj[..., 2:]
    bad = jnp.abs(z) < 1e-9
    uv = proj[..., :2] / jnp.where(bad, 1e-9, z)
    err = ((uv - x2d[None]) ** 2).sum(-1)
    # points behind the camera are not inliers
    return jnp.where((z[..., 0] <= 0), jnp.inf, err)


@functools.partial(
    jax.jit, static_argnames=("num_hypotheses", "lo_iters")
)
@highest_precision
def ransac_pnp(
    key,
    points2D,
    points3D,
    mask,
    K,
    threshold_px=12.0,
    num_hypotheses=512,
    lo_iters=2,
):
    """Absolute pose from padded 2D-3D correspondences.

    points2D: (N, 2) pixel coords; points3D: (N, 3); mask: (N,) validity;
    K: (3, 3) intrinsics. Returns {R, t, inliers, num_inliers, success}
    with R, t mapping world → camera.
    """
    n = points2D.shape[0]
    Kinv = jnp.linalg.inv(K)
    ph = jnp.concatenate([points2D, jnp.ones_like(points2D[:, :1])], -1)
    xn = (ph @ Kinv.T)[:, :2]  # normalised image points
    # threshold in normalised units (divide by focal)
    f = (K[0, 0] + K[1, 1]) / 2.0
    thr2 = (threshold_px / f) ** 2

    # sample 6-point minimal sets
    g = jax.random.gumbel(key, (num_hypotheses, n))
    g = jnp.where(mask[None, :], g, NEG_INF)
    _, idx = lax.top_k(g, MIN_PNP_POINTS)
    q2 = xn[idx]  # (S, 6, 2)
    q3 = points3D[idx]  # (S, 6, 3)

    Ps = _dlt_camera_matrices(q2, q3)
    Ps = jnp.where(jnp.isfinite(Ps).all((-2, -1), keepdims=True), Ps, 0.0)
    # normalise sign so most minimal points are in front
    X = jnp.concatenate([q3, jnp.ones_like(q3[..., :1])], -1)
    depths = jnp.einsum("sij,smj->smi", Ps, X)[..., 2]
    sign = jnp.where(jnp.sum(depths > 0, 1, keepdims=True)
                     >= (MIN_PNP_POINTS // 2 + 1), 1.0, -1.0)
    Ps = Ps * sign[..., None]

    r2 = _reprojection_errors(Ps, xn, points3D)
    quality = jnp.where(
        mask[None, :] & jnp.isfinite(r2),
        jnp.maximum(0.0, 1.0 - r2 / thr2), 0.0,
    )
    scores = quality.sum(-1)
    best = jnp.argmax(scores)
    P = Ps[best]

    # local optimisation: weighted DLT on current inliers
    def lo_body(_, P):
        r2 = _reprojection_errors(P[None], xn, points3D)[0]
        w = jnp.where(mask & jnp.isfinite(r2),
                      jnp.maximum(0.0, 1.0 - r2 / thr2), 0.0)
        enough = (w > 0).sum() >= MIN_PNP_POINTS
        sw = jnp.sqrt(w + 1e-12)
        A2 = _weighted_dlt_rows(xn, points3D, sw)
        P_new = solve_nullvec_fix_last(A2[None])[0].reshape(3, 4)
        depths = jnp.concatenate(
            [points3D, jnp.ones_like(points3D[:, :1])], -1) @ P_new[2]
        flip = (jnp.sum((depths < 0) & (w > 0))
                > jnp.sum((depths > 0) & (w > 0)))
        P_new = jnp.where(flip, -P_new, P_new)
        return jnp.where(enough, P_new, P)

    P = lax.fori_loop(0, lo_iters, lo_body, P)

    r2 = _reprojection_errors(P[None], xn, points3D)[0]
    inliers = (r2 < thr2) & mask
    R, t = _orthogonalize(P, xn, points3D)
    num = inliers.sum().astype(jnp.int32)
    return {
        "R": R,
        "t": t,
        "inliers": inliers,
        "num_inliers": num,
        "success": num >= MIN_PNP_POINTS,
    }


def _weighted_dlt_rows(x2d, X3d, sw):
    """Weighted DLT rows over ALL points. x2d: (N,2), X3d: (N,3),
    sw: (N,) sqrt-weights → (2N, 12)."""
    X = jnp.concatenate([X3d, jnp.ones_like(X3d[:, :1])], -1)
    u = x2d[:, 0:1]
    v = x2d[:, 1:2]
    zeros = jnp.zeros_like(X)
    rows_u = jnp.concatenate([X, zeros, -u * X], -1) * sw[:, None]
    rows_v = jnp.concatenate([zeros, X, -v * X], -1) * sw[:, None]
    return jnp.concatenate([rows_u, rows_v], 0)
