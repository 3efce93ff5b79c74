"""Headless WebUI-logic test: the full run_matching_ui callback (pipeline +
visualization panels + stats), without gradio installed."""

import numpy as np
import pytest

from imcui_tpu.ui.app_class import ImageMatchingApp
from imcui_tpu.utils.image import read_image

IMG0 = "/root/reference/tests/data/02928139_3448003521.jpg"
IMG1 = "/root/reference/tests/data/17295357_9106075285.jpg"


@pytest.fixture(scope="module")
def app():
    return ImageMatchingApp(config="/root/repo/config/app.yaml")


def test_run_matching_ui_panels(app):
    img0 = read_image(IMG0)
    img1 = read_image(IMG1)
    (kpts_img, raw_img, ransac_img, stats, pred, warped,
     pred_file) = app.run_matching_ui(
        img0, img1,
        match_threshold=0.0,
        extract_max_keypoints=2000,
        keypoint_threshold=1e-4,
        key="sift",  # handcrafted → meaningful even offline
    )
    for panel in (kpts_img, raw_img, ransac_img):
        assert isinstance(panel, np.ndarray)
        assert panel.ndim == 3 and panel.shape[2] == 3
    assert stats["num_raw_matches"] >= stats["num_ransac_matches"] >= 0
    assert stats["num_raw_matches"] > 30  # SIFT on the real pair
    assert "geom_info" in pred


def test_rerun_ransac_from_state(app):
    img0 = read_image(IMG0)
    pred = app.run_matching_ui(
        img0, img0.copy(),
        match_threshold=0.0, extract_max_keypoints=512,
        keypoint_threshold=1e-4, key="sift",
    )[4]
    img, stats = app._rerun(dict(pred), "TPU_LORANSAC", 8.0, 0.9999, 2000)
    assert stats["num_ransac_matches"] > 50  # self-pair: most survive


def test_reset_state_shape(app):
    out = app.ui_reset_state()
    assert len(out) == 16
