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
# fast batched hypothesis stage (VPU-friendly; no eigh/svd in the hot loop)
# ---------------------------------------------------------------------------

def inv3x3(M):
    """Closed-form adjugate 3×3 inverse — batched VPU math, no LU.
    M: (..., 3, 3)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    Hh = b * g - a * h
    Ii = a * e - b * d
    det = a * A + b * D + c * G
    adj = jnp.stack(
        [
            jnp.stack([A, B, C], -1),
            jnp.stack([D, E, F], -1),
            jnp.stack([G, Hh, Ii], -1),
        ],
        -2,
    )
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    return adj / det[..., None, None]


def solve_nullvec_fix_last(A, ridge=1e-8):
    """Solve the minimal DLT system A h ≈ 0 with the gauge h_last = 1.

    A: (S, m, d). Normal equations BᵀB x = -Bᵀc solved by unrolled
    Gaussian elimination (SPD after Hartley normalisation; 12× faster on
    TPU than a batched eigh of the d×d AᵀA). Degenerate samples yield
    wild models that score ~0 inliers — RANSAC's own filter.
    Returns (S, d) with trailing 1.
    """
    d = A.shape[-1] - 1
    B, c = A[..., :d], A[..., d]
    M = jnp.einsum("smi,smj->sij", B, B,
                   preferred_element_type=jnp.float32)
    M = M + ridge * jnp.eye(d, dtype=M.dtype)
    b = -jnp.einsum("smi,sm->si", B, c, preferred_element_type=jnp.float32)
    aug = jnp.concatenate([M, b[..., None]], -1)  # (S, d, d+1)
    for k in range(d):
        piv = aug[:, k, k:k + 1]
        piv = jnp.where(jnp.abs(piv) > 1e-12, piv, 1e-12)
        row = aug[:, k] / piv
        aug = aug - aug[:, :, k:k + 1] * row[:, None, :]
        aug = aug.at[:, k].set(row)
    x = aug[:, :, d]
    return jnp.concatenate([x, jnp.ones_like(x[:, :1])], -1)


_solve_h9 = solve_nullvec_fix_last  # internal alias used by the solvers


def _normalize_batch(p):
    """Per-hypothesis Hartley normalisation. p: (S, m, 2) →
    normalized (S, m, 2), centroids (S, 2), scales (S,)."""
    c = p.mean(1, keepdims=True)
    d = jnp.sqrt(((p - c) ** 2).sum(-1))
    s = jnp.sqrt(2.0) / jnp.maximum(d.mean(1), 1e-8)
    return (p - c) * s[:, None, None], c[:, 0], s


def _T_matrix(c, s):
    """(S,) similarity transforms T = [[s,0,-s·cx],[0,s,-s·cy],[0,0,1]]."""
    z = jnp.zeros_like(s)
    o = jnp.ones_like(s)
    return jnp.stack(
        [
            jnp.stack([s, z, -s * c[:, 0]], -1),
            jnp.stack([z, s, -s * c[:, 1]], -1),
            jnp.stack([z, z, o], -1),
        ],
        1,
    )


def _minimal_homographies(q0, q1):
    """Batched 4-point DLT. q0/q1: (S, 4, 2) → (S, 3, 3)."""
    n0, c0, s0 = _normalize_batch(q0)
    n1, c1, s1 = _normalize_batch(q1)
    x, y = n0[..., 0], n0[..., 1]
    u, v = n1[..., 0], n1[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    ax = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], -1)
    ay = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], -1)
    A = jnp.concatenate([ax, ay], 1)  # (S, 8, 9)
    h = _solve_h9(A)
    Hn = h.reshape(-1, 3, 3)
    H = jnp.einsum("sij,sjk,skl->sil", inv3x3(_T_matrix(c1, s1)), Hn,
                   _T_matrix(c0, s0), preferred_element_type=jnp.float32)
    return H / jnp.where(jnp.abs(H[:, 2:3, 2:3]) > 1e-8,
                         H[:, 2:3, 2:3], 1.0)


def _minimal_fundamentals(q0, q1):
    """Batched 8-point solve. q0/q1: (S, 8, 2) → (S, 3, 3).

    The rank-2 projection is deliberately skipped here: the Sampson error
    of the full-rank F ranks hypotheses just as well, and the batched 3×3
    SVD it would need costs ~10 ms for 2048 hypotheses. The final model is
    projected in the refit (fundamental_8pt).
    """
    n0, c0, s0 = _normalize_batch(q0)
    n1, c1, s1 = _normalize_batch(q1)
    x0, y0 = n0[..., 0], n0[..., 1]
    x1, y1 = n1[..., 0], n1[..., 1]
    one = jnp.ones_like(x0)
    A = jnp.stack(
        [x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1, x0, y0, one], -1
    )  # (S, 8, 9)
    f = _solve_h9(A)
    Fn = f.reshape(-1, 3, 3)
    T0 = _T_matrix(c0, s0)
    T1 = _T_matrix(c1, s1)
    F = jnp.einsum("sji,sjk,skl->sil", T1, Fn, T0,
                   preferred_element_type=jnp.float32)
    norm = jnp.sqrt((F * F).sum((-2, -1), keepdims=True))
    return F / jnp.maximum(norm, 1e-12)


def _batched_homography_errors(H, pts0, pts1):
    """Symmetric transfer error for all hypotheses at once.
    H: (S, 3, 3); pts: (N, 2) → (S, N)."""
    p0 = jnp.concatenate([pts0, jnp.ones_like(pts0[:, :1])], -1)
    p1 = jnp.concatenate([pts1, jnp.ones_like(pts1[:, :1])], -1)

    def proj(M, p):  # (S,3,3), (N,3) → (S,N,2)
        q = jnp.einsum("sij,nj->sni", M, p,
                       preferred_element_type=jnp.float32)
        z = q[..., 2:]
        return q[..., :2] / jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)

    Hinv = inv3x3(H)
    e01 = ((proj(H, p0) - pts1[None]) ** 2).sum(-1)
    e10 = ((proj(Hinv, p1) - pts0[None]) ** 2).sum(-1)
    return 0.5 * (e01 + e10)


def _batched_sampson_errors(F, pts0, pts1):
    """Sampson error for all hypotheses at once. F: (S,3,3) → (S, N)."""
    p0 = jnp.concatenate([pts0, jnp.ones_like(pts0[:, :1])], -1)
    p1 = jnp.concatenate([pts1, jnp.ones_like(pts1[:, :1])], -1)
    Fp0 = jnp.einsum("sij,nj->sni", F, p0,
                     preferred_element_type=jnp.float32)
    Ftp1 = jnp.einsum("sji,nj->sni", F, p1,
                      preferred_element_type=jnp.float32)
    num = jnp.einsum("ni,sni->sn", p1, Fp0,
                     preferred_element_type=jnp.float32) ** 2
    den = (Fp0[..., 0] ** 2 + Fp0[..., 1] ** 2
           + Ftp1[..., 0] ** 2 + Ftp1[..., 1] ** 2)
    return num / jnp.maximum(den, 1e-12)


# ---------------------------------------------------------------------------
# RANSAC core
# ---------------------------------------------------------------------------

_SOLVERS = {
    # refit solver (weighted, full-N), per-model residual, minimal solver,
    # batched residual, minimal size
    "homography": (homography_dlt, homography_sym_transfer_error,
                   _minimal_homographies, _batched_homography_errors, 4),
    "fundamental": (fundamental_8pt, sampson_error,
                    _minimal_fundamentals, _batched_sampson_errors, 8),
}


def _sample_indices(key, mask, num_hypotheses, k):
    """Gumbel top-k sampling without replacement from valid indices.
    Returns (S, k) int32 indices into the point arrays."""
    n = mask.shape[0]
    g = jax.random.gumbel(key, (num_hypotheses, n))
    g = jnp.where(mask[None, :], g, NEG_INF)
    _, idx = lax.top_k(g, k)  # (S, k)
    return idx


@functools.partial(
    jax.jit,
    static_argnames=("model", "num_hypotheses", "lo_iters"),
)
@highest_precision
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

    Hot path: gather the k-point minimal sets for ALL hypotheses at once,
    solve them with batched closed-form linear algebra (no eigh/svd), and
    score every hypothesis against every correspondence in one (S, N)
    einsum. The eigh-based weighted DLT runs only in the final local
    optimisation (lo_iters solves per call).
    """
    refit_solver, residual_fn, minimal_solver, batched_errors, k_min = \
        _SOLVERS[model]
    thr2 = threshold**2

    idx = _sample_indices(key, mask, num_hypotheses, k_min)  # (S, k)
    q0 = pts0[idx]  # (S, k, 2)
    q1 = pts1[idx]
    Ms = minimal_solver(q0, q1)  # (S, 3, 3)
    Ms = jnp.where(jnp.isfinite(Ms).all((-2, -1), keepdims=True), Ms, 0.0)
    r2 = batched_errors(Ms, pts0, pts1)  # (S, N)
    quality = jnp.where(mask[None, :],
                        jnp.maximum(0.0, 1.0 - r2 / thr2), 0.0)
    scores = quality.sum(-1)
    best = jnp.argmax(scores)
    M = Ms[best]

    # local optimisation: iteratively reweighted least squares on inliers
    def lo_body(_, M):
        r2 = residual_fn(M, pts0, pts1)
        w = jnp.where(mask, jnp.maximum(0.0, 1.0 - r2 / thr2), 0.0)
        # guard: keep previous model if too few inliers to refit
        enough = (w > 0).sum() >= k_min
        M_new = refit_solver(pts0, pts1, w + 1e-12)
        return jnp.where(enough, M_new, M)

    M = lax.fori_loop(0, lo_iters, lo_body, M)

    r2 = residual_fn(M, pts0, pts1)
    inliers = (r2 < thr2) & mask
    quality = jnp.where(mask, jnp.maximum(0.0, 1.0 - r2 / thr2), 0.0).sum()
    del confidence  # hypothesis count is static by design
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
