"""Unit tests for detection ops: NMS, top-k selection, descriptor sampling."""

import jax.numpy as jnp
import numpy as np

from imcui_tpu.ops import nms


def test_simple_nms_isolated_maxima():
    scores = np.zeros((32, 32), np.float32)
    scores[5, 5] = 1.0
    scores[5, 7] = 0.8  # within radius 2 of the max → suppressed
    scores[20, 20] = 0.9
    out = np.asarray(nms.simple_nms(jnp.asarray(scores), radius=2))
    assert out[5, 5] == 1.0
    assert out[5, 7] == 0.0
    assert out[20, 20] == 0.9


def test_simple_nms_keeps_far_points():
    scores = np.zeros((64, 64), np.float32)
    pts = [(8, 8), (8, 40), (40, 8), (40, 40)]
    for i, (y, x) in enumerate(pts):
        scores[y, x] = 0.5 + 0.1 * i
    out = np.asarray(nms.simple_nms(jnp.asarray(scores), radius=4))
    assert (out > 0).sum() == 4


def test_border_mask_valid_region():
    m = np.asarray(nms.border_mask(16, 16, border=2, valid_wh=(12, 10)))
    assert m[1, 5] == 0  # top border
    assert m[5, 1] == 0  # left border
    assert m[5, 5] == 1
    assert m[9, 5] == 0  # beyond valid height (10) - border
    assert m[5, 11] == 0  # beyond valid width (12) - border


def test_select_topk_fixed_shape():
    scores = np.zeros((16, 16), np.float32)
    scores[3, 4] = 0.9
    scores[10, 2] = 0.7
    kpts, ks, mask = nms.select_topk_keypoints(jnp.asarray(scores), k=8,
                                               threshold=0.1)
    kpts, ks, mask = map(np.asarray, (kpts, ks, mask))
    assert kpts.shape == (8, 2) and ks.shape == (8,) and mask.shape == (8,)
    assert mask.sum() == 2
    assert tuple(kpts[0]) == (4.0, 3.0)  # xy order
    assert tuple(kpts[1]) == (2.0, 10.0)
    assert not mask[2:].any()


def test_sample_descriptors_constant_map():
    desc = np.ones((4, 8, 8), np.float32)
    desc[1] = 2.0
    kpts = jnp.asarray([[10.0, 12.0], [31.0, 17.0]])
    out = np.asarray(nms.sample_descriptors(kpts, jnp.asarray(desc), s=8))
    assert out.shape == (4, 2)
    # constant map → L2-normalised constant vector everywhere
    expected = np.array([1.0, 2.0, 1.0, 1.0])
    expected = expected / np.linalg.norm(expected)
    np.testing.assert_allclose(out[:, 0], expected, atol=1e-5)
    np.testing.assert_allclose(out[:, 1], expected, atol=1e-5)


def test_depth_to_space_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(64, 3, 5).astype(np.float32)  # 64 = 8x8 cells
    out = np.asarray(nms.depth_to_space(jnp.asarray(x), 8))
    assert out.shape == (1, 24, 40)
    # channel c maps to offset (c // 8, c % 8)
    for c in [0, 7, 9, 63]:
        dy, dx = c // 8, c % 8
        np.testing.assert_allclose(out[0, dy::8, dx::8], x[c], atol=1e-6)


def test_soft_argmax_refinement_shifts_toward_mass():
    scores = np.zeros((32, 32), np.float32)
    scores[10, 10] = 1.0
    scores[10, 11] = 1.0  # equal mass to the right → offset +0.5 in x
    kpts = jnp.asarray([[10.0, 10.0]])
    ref = np.asarray(nms.soft_argmax_refinement(kpts, jnp.asarray(scores),
                                                radius=2))
    assert 0.3 < ref[0, 0] - 10.0 < 0.7
    assert abs(ref[0, 1] - 10.0) < 1e-5


def test_pallas_nms_cellmax_matches_xla_chain():
    """ops/pallas_nms.py (interpret mode) vs the XLA postproc chain:
    per-4x4-cell NMS'd max + in-cell argmax must match simple_nms ->
    border/valid mask exactly (score ties may legitimately resolve to a
    different member of the tie - same class approx_max_k accepts)."""
    from imcui_tpu.ops import pallas_nms

    B, H, W = 2, 128, 256
    rng = np.random.default_rng(7)
    heat = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    valid_wh = jnp.asarray([[W, H], [200, 100]], jnp.int32)

    cmax, csub = pallas_nms.nms_cellmax(heat, valid_wh, radius=4,
                                        border=4, interpret=True)
    cmax, csub = np.asarray(cmax), np.asarray(csub)

    for b in range(B):
        s = nms.simple_nms(heat[b].astype(jnp.float32), 4)
        s = s * nms.border_mask(H, W, 4, valid_wh=valid_wh[b],
                                dtype=s.dtype)
        s = np.asarray(s)
        ref = s.reshape(H // 4, 4, W // 4, 4).transpose(0, 2, 1, 3)
        ref = ref.reshape(H // 4, W // 4, 16)
        rmax, rarg = ref.max(-1), ref.argmax(-1)
        np.testing.assert_allclose(cmax[b], rmax, atol=0)
        sel = rmax > 0
        # positions must agree except where the cell holds an exact tie
        disagree = (rarg != csub[b]) & sel
        for cy, cx in np.argwhere(disagree):
            got = ref[cy, cx, int(csub[b][cy, cx])]
            assert got == rmax[cy, cx], (cy, cx)


def test_select_keypoints_k_exceeds_cell_count():
    """select_keypoints must survive k >= number of 4x4 cells (small
    image + large max_keypoints, e.g. LISRD's SuperPoint detector at
    2048 kpts on a 128px input): every cell is returned and the excess
    slots come back masked with finite scores."""
    from imcui_tpu.ops import pallas_nms

    rng = np.random.default_rng(5)
    heat = jnp.asarray(rng.uniform(0, 1, (2, 128, 128)).astype(np.float32))
    valid_wh = jnp.tile(jnp.asarray([[128, 128]], jnp.int32), (2, 1))
    k = 2048  # cells: (128/4)**2 = 1024 < k (the LISRD default config)
    kpts, scores, mask = pallas_nms.select_keypoints(
        heat, valid_wh, k, threshold=0.005, interpret=True)
    kpts, scores, mask = map(np.asarray, (kpts, scores, mask))
    assert kpts.shape == (2, k, 2) and scores.shape == (2, k)
    assert np.isfinite(scores).all() and np.isfinite(kpts).all()
    assert mask.sum(1).max() <= 1024  # no more than one kpt per cell
    assert mask.sum() > 0
    assert (scores[~mask] == 0).all() and (kpts[~mask] == 0).all()
    # exact-k edge: k == cell count goes through the same dense path
    kpts2, scores2, mask2 = pallas_nms.select_keypoints(
        heat, valid_wh, 1024, threshold=0.005, interpret=True)
    assert np.isfinite(np.asarray(scores2)).all()


def test_roma_local_correlation_paths_agree():
    """The all-pairs-MXU local correlation (coarse scales) must equal
    the per-offset gather formulation — same grid_sample(zeros,
    align_corners=False) semantics by linearity of the dot product."""
    import jax
    from imcui_tpu.models.matchers import roma

    rng = np.random.default_rng(11)
    h, w, d, r = 20, 26, 32, 3
    f0 = jnp.asarray(rng.normal(size=(h, w, d)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(h, w, d)).astype(np.float32))
    warp = jnp.asarray(
        rng.uniform(-1.1, 1.1, size=(h, w, 2)).astype(np.float32))

    ref = np.asarray(roma._local_correlation_gather(f0, f1, warp, r))
    mxu = roma._local_correlation_mxu(f0, f1, warp, r)
    itap = roma._local_correlation_int_taps(f0, f1, warp, r)

    np.testing.assert_allclose(np.asarray(mxu), ref, atol=2e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(itap), ref, atol=2e-5,
                               rtol=1e-5)
