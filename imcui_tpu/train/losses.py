"""Ground-truth assignment + the published LightGlue training losses.

Recipe (Lindenberger et al., ICCV 2023, §4): supervision comes from a
known two-view transform. Keypoints in image 0 are reprojected into
image 1; mutual nearest pairs under a tight pixel threshold are
positives M, points whose nearest reprojection is beyond a looser
threshold (or that leave the image) are unmatchable Ā/B̄. The loss is
the negative log-likelihood of this labelling under the assignment
matrix, averaged over EVERY layer's assignment head (deep supervision —
this is what makes adaptive-depth early exits well-calibrated), plus a
binary cross-entropy on the token-confidence heads whose target is
"does this layer's match already agree with the final layer's?"
(paper §3.1 "confidence classifier"; gradients stop into the backbone).

All shapes static: labels are boolean masks over the padded keypoint
slots, every mean is a masked mean.
"""

import jax
import jax.numpy as jnp

from .homography import warp_points


def gt_correspondences(kpts0, kpts1, mask0, mask1, H, wh,
                       px_pos=3.0, px_neg=5.0):
    """Label a padded keypoint pair under a known homography.

    Returns (gt0, pos0, neg0, neg1): gt0 (N,) int32 index into kpts1 or
    -1; pos0 (N,) bool positives; neg0 (N,) / neg1 (M,) bool
    unmatchable points (dustbin supervision). Pairs whose reprojection
    distance falls between px_pos and px_neg are left unlabelled
    (neither positive nor negative), as published.
    """
    proj = warp_points(H, kpts0)  # kpts0 in image-1 coordinates
    inb = ((proj[:, 0] >= 0) & (proj[:, 0] <= wh[0] - 1)
           & (proj[:, 1] >= 0) & (proj[:, 1] <= wh[1] - 1))
    d2 = ((proj[:, None, :] - kpts1[None, :, :]) ** 2).sum(-1)
    d2 = jnp.where(mask0[:, None] & mask1[None, :], d2, 1e18)
    nn0 = jnp.argmin(d2, axis=1)             # (N,) best partner in 1
    nn1 = jnp.argmin(d2, axis=0)             # (M,) best partner in 0
    d0 = jnp.sqrt(jnp.min(d2, axis=1))
    d1 = jnp.sqrt(jnp.min(d2, axis=0))
    mutual = jnp.arange(kpts0.shape[0]) == jnp.take(nn1, nn0)

    pos0 = mutual & (d0 < px_pos) & inb & mask0
    gt0 = jnp.where(pos0, nn0, -1).astype(jnp.int32)
    neg0 = mask0 & ~pos0 & ((d0 > px_neg) | ~inb)
    matched1 = jnp.zeros(kpts1.shape[0], bool).at[nn0].max(pos0)
    neg1 = mask1 & ~matched1 & (d1 > px_neg)
    return gt0, pos0, neg0, neg1


def _masked_mean(x, m):
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


def assignment_nll(scores, gt0, pos0, neg0, neg1):
    """−log-likelihood of the labelling under one (N+1, M+1) log-score
    matrix: positives pull their cell, unmatchables pull their dustbin
    (the two dustbin terms carry half weight each, as published)."""
    n, m = scores.shape[0] - 1, scores.shape[1] - 1
    idx = jnp.clip(gt0, 0, m - 1)
    pos_ll = jnp.take_along_axis(scores[:n, :m], idx[:, None], 1)[:, 0]
    loss = -_masked_mean(pos_ll, pos0)
    loss += -0.5 * _masked_mean(scores[:n, m], neg0)
    loss += -0.5 * _masked_mean(scores[n, :m], neg1)
    return loss


def deep_supervised_loss(scores_layers, gt0, pos0, neg0, neg1):
    """Mean assignment NLL over every layer's head (scores_layers is a
    (L, N+1, M+1) stack)."""
    per = jax.vmap(lambda s: assignment_nll(s, gt0, pos0, neg0, neg1))(
        scores_layers)
    return per.mean()


def confidence_bce(confs0, confs1, scores_layers, mask0, mask1):
    """Token-confidence target: layer ℓ's row/col argmax already equals
    the final layer's. confs0 (L−1, N), confs1 (L−1, M) are sigmoid
    outputs; targets are stop-gradient by construction (argmax)."""
    final = scores_layers[-1]
    n, m = final.shape[0] - 1, final.shape[1] - 1
    fin0 = jnp.argmax(final[:n, :m], axis=1)
    fin1 = jnp.argmax(final[:n, :m], axis=0)

    def layer_bce(c0, c1, s):
        t0 = (jnp.argmax(s[:n, :m], axis=1) == fin0).astype(jnp.float32)
        t1 = (jnp.argmax(s[:n, :m], axis=0) == fin1).astype(jnp.float32)
        eps = 1e-6
        b0 = -(t0 * jnp.log(c0 + eps) + (1 - t0) * jnp.log(1 - c0 + eps))
        b1 = -(t1 * jnp.log(c1 + eps) + (1 - t1) * jnp.log(1 - c1 + eps))
        return _masked_mean(b0, mask0) + _masked_mean(b1, mask1)

    per = jax.vmap(layer_bce)(confs0, confs1, scores_layers[:-1])
    return per.mean()
