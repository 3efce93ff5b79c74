"""Point+line matcher (GlueStick-family) tests."""

import numpy as np
import pytest

from imcui_tpu.utils.image import read_image

IMG = "/root/reference/tests/data/02928139_3448003521.jpg"


@pytest.fixture(scope="module")
def gluestick():
    from imcui_tpu.models.matchers.gluestick import GlueStick

    return GlueStick({"max_keypoints": 256})


def crop():
    img = read_image(IMG, grayscale=True).astype(np.float32) / 255.0
    return img[400:656, 250:506]  # structured building region


def test_line_contract_self_pair(gluestick):
    img = crop()
    out = gluestick({"image0": img[None, None],
                     "image1": img[None, None].copy()})
    for key in ("lines0", "lines1", "raw_lines0", "raw_lines1",
                "line_keypoints0", "line_keypoints1"):
        assert key in out, key
    raw = out["raw_lines0"][0]
    matched0 = out["lines0"][0]
    matched1 = out["lines1"][0]
    assert len(raw) > 50
    assert len(matched0) == len(matched1) > 50
    np.testing.assert_allclose(matched0, matched1)  # identity on self pair


def test_line_match_dense_ui_path(gluestick):
    """The dense UI path must surface the line keys with original-scale
    coordinates (reference: match_dense.py:687-721)."""
    from imcui_tpu.pipeline import match_dense

    img = (crop() * 255).astype(np.uint8)
    ret = match_dense.match_images(
        gluestick, img, img.copy(),
        {"grayscale": True, "resize_max": 256, "dfactor": 8},
    )
    assert "lines0" in ret and "line_keypoints0_orig" in ret
    assert len(ret["lines0"][0] if ret["lines0"].ndim == 4
               else ret["lines0"]) > 0


def test_display_matches_line_branch(gluestick):
    """display_matches must render line matchers as colored segments
    (reference parity: imcui/ui/viz.py:474-508) instead of an empty
    point panel."""
    from imcui_tpu.pipeline import match_dense
    from imcui_tpu.ui.viz import display_matches

    img = (crop() * 255).astype(np.uint8)
    ret = match_dense.match_images(
        gluestick, img, img.copy(),
        {"grayscale": True, "resize_max": 256, "dfactor": 8},
    )
    pred = dict(ret)
    pred["image0_orig"] = np.stack([img] * 3, -1)
    pred["image1_orig"] = np.stack([img] * 3, -1)
    # squeeze the batch dim the way the UI path does
    for k in ("lines0_orig", "lines1_orig",
              "line_keypoints0_orig", "line_keypoints1_orig"):
        if k in pred and np.asarray(pred[k]).ndim > 3 - ("keypoints" in k):
            pred[k] = np.asarray(pred[k])[0]
    im, n = display_matches(pred, tag="KPTS_RAW")
    assert n > 0
    assert im.ndim == 3 and im.shape[2] == 3
    # stacked panel: endpoint matches above + colored lines below
    assert im.shape[0] > 400
