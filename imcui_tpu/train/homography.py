"""On-device random homographies + batched inverse warps (all jittable).

The published LightGlue/SuperPoint recipes synthesise supervision from
known planar warps; here both the sampling and the image warp are pure
XLA (no cv2, no host round-trip), so the whole augmentation pipeline
fuses into the training step. Point convention matches the rest of the
repo: xy pixel coordinates, origin at the top-left pixel *center*
(eval/warp.py uses the same convention via cv2).
"""

import jax
import jax.numpy as jnp


def sample_homographies(key, batch, w, h, max_angle=25.0,
                        scale_range=(0.8, 1.25), max_translation=0.08,
                        perspective=2e-4):
    """(batch, 3, 3) random invertible warps about the image center:
    rotation ±max_angle°, log-uniform scale, translation as a fraction
    of the image size, and a small projective term — the same family as
    eval/warp.py:make_homographies / ui/examples.py, but sampled on
    device so the training step stays one program."""
    ka, ks, kt, kp = jax.random.split(key, 4)
    ang = jax.random.uniform(ka, (batch,), minval=-max_angle,
                             maxval=max_angle) * (jnp.pi / 180.0)
    logs = jax.random.uniform(
        ks, (batch,), minval=jnp.log(scale_range[0]),
        maxval=jnp.log(scale_range[1]))
    s = jnp.exp(logs)
    t = jax.random.uniform(kt, (batch, 2), minval=-max_translation,
                           maxval=max_translation) * jnp.asarray(
                               [w, h], jnp.float32)
    p = jax.random.uniform(kp, (batch, 2), minval=-perspective,
                           maxval=perspective)

    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    # similarity about the center, then translation; the projective row
    # is recentered so the image center is a fixed point of the
    # perspective term (w₂·center = 1 keeps the warp well-conditioned)
    a = s * ca
    b = s * sa
    row0 = jnp.stack([a, -b, cx - a * cx + b * cy + t[:, 0]], -1)
    row1 = jnp.stack([b, a, cy - b * cx - a * cy + t[:, 1]], -1)
    row2 = jnp.stack([p[:, 0], p[:, 1],
                      1.0 - p[:, 0] * cx - p[:, 1] * cy], -1)
    return jnp.stack([row0, row1, row2], 1)


def sample_pose_homographies(key, batch, w, h, max_rot_deg=12.0,
                             max_trans_frac=0.25, max_tilt_deg=12.0,
                             min_trans_frac=0.08,
                             return_components=False):
    """(batch, 3, 3) plane-induced homographies of a CALIBRATED camera
    pair: H = K(R + t·nᵀ/d)K⁻¹ for the scene plane n·X = d (view-0
    frame) and X₁ = R·X₀ + t — the sign-explicit form of Hartley &
    Zisserman §13.2, whose minus form assumes the nᵀX + d = 0 plane
    convention. Pose/plane distributions follow
    eval/synthpose.sample_scene. (Either sign yields correspondences
    exactly consistent with E = [t]ₓR — plane-induced warps satisfy the
    epipolar constraint for ANY plane — but the plus form also makes
    the backproject→rigid-move→reproject chain physical, which the
    planted-geometry test pins.)

    This is the wide-baseline counterpart of ``sample_homographies``:
    the similarity-family warps train in-plane invariance, but a real
    relative pose induces foreshortening that family never produces —
    the r5 pose-AUC diagnosis (BASELINE.md "Pose AUC") traced the
    flagship's gap to exactly that missing viewpoint invariance. All
    sampling is on-device so the training step stays one program."""
    kr, ka, kt, kn, kd, kx = jax.random.split(key, 6)
    f = 1.2 * max(w, h)
    K = jnp.asarray([[f, 0.0, w / 2.0], [0.0, f, h / 2.0],
                     [0.0, 0.0, 1.0]])
    Kinv = jnp.linalg.inv(K)

    # rotation: random axis, 3..max_rot_deg magnitude (Rodrigues)
    angle = jax.random.uniform(kr, (batch,), minval=3.0,
                               maxval=max_rot_deg) * (jnp.pi / 180.0)
    axis = jax.random.normal(ka, (batch, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)

    def rodrigues(ax, ang):
        zero = jnp.zeros(())
        Kx = jnp.array([[zero, -ax[2], ax[1]],
                        [ax[2], zero, -ax[0]],
                        [-ax[1], ax[0], zero]])
        return (jnp.eye(3) + jnp.sin(ang) * Kx
                + (1.0 - jnp.cos(ang)) * (Kx @ Kx))

    R = jax.vmap(rodrigues)(axis, angle)

    # translation: sideways-biased, scaled to scene depth 1.0
    kt1, kt2 = jax.random.split(kt)
    t = jax.random.normal(kt1, (batch, 3)) * jnp.asarray([1.0, 0.6, 0.4])
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    t = t * jax.random.uniform(kt2, (batch, 1), minval=min_trans_frac,
                               maxval=max_trans_frac)

    # scene plane: tilted z-normal, offset d ~ U[0.75, 1.35]
    tilt = jax.random.uniform(kn, (batch,),
                              maxval=max_tilt_deg) * (jnp.pi / 180.0)
    taxis = jax.random.normal(kx, (batch, 2))
    taxis = taxis / jnp.linalg.norm(taxis, axis=-1, keepdims=True)
    taxis3 = jnp.concatenate([taxis, jnp.zeros((batch, 1))], -1)
    n = jnp.einsum("bij,j->bi", jax.vmap(rodrigues)(taxis3, tilt),
                   jnp.asarray([0.0, 0.0, 1.0]))
    d = jax.random.uniform(kd, (batch, 1, 1), minval=0.75, maxval=1.35)

    H = jnp.einsum("ij,bjk,kl->bil", K,
                   R + t[:, :, None] * n[:, None, :] / d, Kinv)
    H = H / H[:, 2:3, 2:3]
    if return_components:
        return H, {"K": K, "R": R, "t": t, "n": n, "d": d[:, 0, 0]}
    return H


def sample_warps(key, batch, w, h, family="similarity", pose_frac=0.5,
                 **kwargs):
    """Warp-family dispatch for the trainers: 'similarity' (the
    published recipes' random similarity+perspective), 'pose' (the
    plane-induced calibrated family), or 'mixed' — per-sample Bernoulli
    between the two (viewpoint invariance without forgetting the
    in-plane family)."""
    if family == "similarity":
        return sample_homographies(key, batch, w, h, **kwargs)
    if family == "pose":
        return sample_pose_homographies(key, batch, w, h, **kwargs)
    if family == "mixed":
        k1, k2, kb = jax.random.split(key, 3)
        hs = sample_homographies(k1, batch, w, h)
        hp = sample_pose_homographies(k2, batch, w, h, **kwargs)
        pick = jax.random.bernoulli(kb, pose_frac, (batch,))
        return jnp.where(pick[:, None, None], hp, hs)
    raise ValueError(f"unknown warp family: {family}")


def warp_points(H, pts):
    """Projective transform: pts (N, 2) xy → (N, 2) under H (3, 3)."""
    x = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], -1) @ H.T
    z = x[:, 2:]
    z = jnp.where(jnp.abs(z) < 1e-9, jnp.where(z < 0, -1e-9, 1e-9), z)
    return x[:, :2] / z


def warp_images(images, Hs):
    """Batched inverse bilinear warp: images (B, C, H, W) → warped so
    that ``out(H·x) = in(x)`` (zeros outside), matching
    cv2.warpPerspective(image, H) up to bilinear sampling."""
    b, c, h, w = images.shape
    Hinv = jnp.linalg.inv(Hs.astype(jnp.float32))

    ys, xs = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    grid = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)  # (HW, 2) xy

    def one(img, hi):
        src = warp_points(hi, grid)  # (HW, 2) xy in the source image
        x, y = src[:, 0], src[:, 1]
        valid = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
        x0i = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
        y0i = jnp.clip(jnp.floor(y), 0, h - 2).astype(jnp.int32)
        # fractional offsets against the CLIPPED base: at the exact last
        # row/column floor(x) = w-1 but the base tap is w-2, so fx must
        # be 1 there (an offset against floor(x) reads pixel w-2 with
        # full weight — an off-by-one found by the identity-warp test)
        fx, fy = x - x0i, y - y0i
        flat = img.reshape(c, -1)  # (C, H*W)
        base = y0i * w + x0i

        def tap(off, wgt):
            return flat[:, base + off] * wgt

        out = (tap(0, (1 - fx) * (1 - fy)) + tap(1, fx * (1 - fy))
               + tap(w, (1 - fx) * fy) + tap(w + 1, fx * fy))
        out = jnp.where(valid[None, :], out, 0.0)
        return out.reshape(c, h, w)

    return jax.vmap(one)(images, Hinv)
