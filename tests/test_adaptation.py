"""Homographic adaptation (train/adaptation.py): the SuperPoint stage-2
self-distillation machinery — aggregation geometry, corner extraction,
real-batch training, and the two-stage driver end-to-end (tiny shapes).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imcui_tpu.models.extractors import superpoint as sp
from imcui_tpu.train import adaptation, data, homography


def test_adapt_heatmap_identity_only_matches_detector():
    """With K=1 the only view is the identity (slot 0 is pinned to eye),
    so the aggregated map must equal the raw detector heatmap."""
    params = sp.init_params(jax.random.PRNGKey(0))
    img = data.synthetic_images(jax.random.PRNGKey(1), 1, 64, 64)[0]
    agg = adaptation.adapt_heatmap(params, img, jax.random.PRNGKey(2),
                                   n_homog=1)
    direct = adaptation.detector_heatmap(params, img[None])[0]
    np.testing.assert_allclose(np.asarray(agg), np.asarray(direct),
                               atol=1e-5)


def test_adapt_heatmap_aggregates_in_source_frame():
    """Aggregation must happen in the SOURCE frame: for a detector-free
    check, warp a delta-like blob image through the machinery by hand —
    warp forward with H, warp back with H⁻¹ — and confirm the blob lands
    where it started (interior pixels, bilinear tolerance)."""
    h, w = 80, 96
    img = np.zeros((1, 1, h, w), np.float32)
    img[0, 0, 30:34, 40:44] = 1.0
    Hs = homography.sample_homographies(jax.random.PRNGKey(3), 1, w, h)
    fwd = homography.warp_images(jnp.asarray(img), Hs)
    back = homography.warp_images(fwd, jnp.linalg.inv(Hs))
    back = np.asarray(back)[0, 0]
    # blob mass stays at the source location (allow bilinear spread)
    assert back[28:36, 38:46].sum() > 0.5 * img.sum()
    outside = back.sum() - back[26:38, 36:48].sum()
    assert outside < 0.05 * img.sum()


def test_adapt_heatmap_consistent_across_k():
    """For a translation-dominant warp family the aggregated map should
    correlate strongly with the single-view detector map (the detector
    is covariant up to border effects); this pins the back-warp
    direction — with the WRONG direction the maps decorrelate."""
    params = sp.init_params(jax.random.PRNGKey(0))
    img = data.synthetic_images(jax.random.PRNGKey(4), 1, 64, 64)[0]
    agg = np.asarray(adaptation.adapt_heatmap(
        params, img, jax.random.PRNGKey(5), n_homog=6))
    direct = np.asarray(adaptation.detector_heatmap(params, img[None])[0])
    inner = np.s_[12:-12, 12:-12]
    a, d = agg[inner].ravel(), direct[inner].ravel()
    corr = np.corrcoef(a, d)[0, 1]
    assert corr > 0.5, corr


def test_extract_corners_planted_peaks():
    h, w = 64, 64
    heat = np.zeros((h, w), np.float32)
    peaks = [(20, 16, 0.9), (40, 48, 0.5), (10, 50, 0.3)]
    for y, x, v in peaks:
        heat[y, x] = v
    heat[2, 2] = 0.8          # inside border margin → must be dropped
    corners, mask = adaptation.extract_corners(
        jnp.asarray(heat), n_max=8, nms_radius=4, threshold=0.1,
        border=8)
    corners, mask = np.asarray(corners), np.asarray(mask)
    assert mask.sum() == 3
    got = {tuple(c) for c in corners[mask].astype(int)}
    assert got == {(16, 20), (48, 40), (50, 10)}
    # strongest first (top_k ordering)
    assert tuple(corners[0].astype(int)) == (16, 20)


def test_extract_corners_nms_suppresses_neighbours():
    heat = np.zeros((32, 32), np.float32)
    heat[15, 15] = 0.9
    heat[15, 17] = 0.8        # within radius-4 window of the stronger
    corners, mask = adaptation.extract_corners(
        jnp.asarray(heat), n_max=4, nms_radius=4, threshold=0.1,
        border=2)
    assert np.asarray(mask).sum() == 1
    assert tuple(np.asarray(corners)[0].astype(int)) == (15, 15)


def test_label_images_shapes_and_determinism():
    params = sp.init_params(jax.random.PRNGKey(0))
    imgs = data.synthetic_images(jax.random.PRNGKey(6), 2, 64, 64)
    c1, m1 = adaptation.label_images(params, imgs, jax.random.PRNGKey(7),
                                     n_homog=3, n_max=32, threshold=0.0)
    c2, m2 = adaptation.label_images(params, imgs, jax.random.PRNGKey(7),
                                     n_homog=3, n_max=32, threshold=0.0)
    assert c1.shape == (2, 32, 2) and m1.shape == (2, 32)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_real_train_step_decreases_loss():
    """Fixed labelled batch + fixed warp key → the jitted real-batch
    step must descend, exactly like the synthetic-stage test."""
    pytest.importorskip("optax")
    from imcui_tpu.train import superpoint as spt

    params, opt_state, optimizer = spt.init_sp_train_state(
        jax.random.PRNGKey(0), lr=3e-4)
    tstep = adaptation.make_real_train_step(optimizer)

    imgs, corners, cmask = data.synthetic_images_with_corners(
        jax.random.PRNGKey(1), 2, 64, 64)
    key = jax.random.PRNGKey(2)  # fixed batch → deterministic descent
    first = None
    for _ in range(6):
        params, opt_state, m = tstep(params, opt_state, key, imgs,
                                     corners, cmask)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first, (first, float(m["loss"]))


def test_train_superpoint_adapted_end_to_end(tmp_path):
    """Tiny two-stage run over a 3-image corpus: trains, labels, saves
    an npz that loads into the serving extractor via checkpoint_npz."""
    pytest.importorskip("optax")
    import cv2

    from imcui_tpu.train import drivers

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    imgs = np.asarray(
        data.synthetic_images(jax.random.PRNGKey(8), 3, 72, 96))
    for i, im in enumerate(imgs[:, 0]):
        cv2.imwrite(str(corpus / f"im{i}.png"), (im * 255).astype(np.uint8))
    cv2.imwrite(str(corpus / "heldout_x.png"),
                (imgs[0, 0] * 255).astype(np.uint8))

    out = tmp_path / "run"
    drivers.train_superpoint_adapted(
        str(corpus), exclude=("heldout",), size=(64, 64), synth_steps=2,
        adapt_rounds=1, real_steps=3, n_homog=2, n_max=32, batch=2,
        synth_mix=2, threshold=0.0, out=str(out), log_fn=lambda s: None)

    path = out / "superpoint_adapted.npz"
    assert path.exists()
    loaded, meta = sp.load_params({"checkpoint_npz": str(path)})
    assert meta["pretrained"] is True
    assert loaded["conv1a"]["w"].shape == (3, 3, 1, 64)
    # the log must show the held-out image was excluded (3-image corpus)
    rec = [json.loads(line)
           for line in (out / "log.jsonl").read_text().splitlines()]
    label = [r for r in rec if r["stage"] == "label-0"]
    assert label and label[0]["mean_corners"] >= 0
