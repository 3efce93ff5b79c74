"""End-to-end sparse pipeline tests: SuperPoint → NN matcher → HDF5.

Uses random-init weights (no network access in CI), so these validate
shapes, contracts, masking, and file formats — numerical parity is
covered by the golden tests once converted checkpoints are available.
"""

import shutil

import numpy as np
import pytest

from imcui_tpu.pipeline import extract_features, match_features
from imcui_tpu.utils.image import read_image

IMG0 = "/root/reference/tests/data/02928139_3448003521.jpg"
IMG1 = "/root/reference/tests/data/17295357_9106075285.jpg"

SMALL_PRE = {
    "grayscale": True,
    "resize_max": 256,
    "dfactor": 8,
}


@pytest.fixture(scope="module")
def superpoint():
    from imcui_tpu.models.extractors.superpoint import SuperPoint

    return SuperPoint({"max_keypoints": 256, "keypoint_threshold": 1e-4})


def test_extract_contract(superpoint):
    image = read_image(IMG0, grayscale=True)
    pred = extract_features.extract(superpoint, image, SMALL_PRE)
    n = 256
    assert pred["keypoints"].shape == (1, n, 2)
    assert pred["scores"].shape == (1, n)
    assert pred["descriptors"].shape == (1, 256, n)
    assert pred["mask"].shape == (1, n)
    assert pred["mask"].sum() > 10  # random init still fires some cells
    # keypoints inside the valid region
    kp = pred["keypoints"][0][pred["mask"][0]]
    w, h = pred["size"]
    assert (kp[:, 0] < w).all() and (kp[:, 1] < h).all()
    # descriptors are unit-norm on valid slots
    d = pred["descriptors"][0][:, pred["mask"][0]]
    np.testing.assert_allclose(np.linalg.norm(d, axis=0), 1.0, atol=1e-3)


def test_match_images_contract(superpoint):
    from imcui_tpu.models.matchers.nearest_neighbor import NearestNeighbor

    matcher = NearestNeighbor({"do_mutual_check": True})
    f0 = extract_features.extract(superpoint, read_image(IMG0, True), SMALL_PRE)
    f1 = extract_features.extract(superpoint, read_image(IMG1, True), SMALL_PRE)
    ret = match_features.match_images(matcher, f0, f1)
    for key in ("keypoints0", "keypoints1", "keypoints0_orig",
                "mkeypoints0", "mkeypoints1", "mkeypoints0_orig",
                "mkeypoints1_orig", "mconf"):
        assert key in ret, key
    assert len(ret["mkeypoints0"]) == len(ret["mkeypoints1"]) == len(ret["mconf"])
    # original-resolution keypoints live in original image bounds
    h0, w0 = read_image(IMG0, True).shape[:2]
    if len(ret["mkeypoints0_orig"]):
        assert ret["mkeypoints0_orig"][:, 0].max() <= w0 + 1
        assert ret["mkeypoints0_orig"][:, 1].max() <= h0 + 1


def test_self_match_is_identity(superpoint):
    """Matching an image against itself must match every valid keypoint to
    itself — a strong pipeline-consistency check independent of weights."""
    from imcui_tpu.models.matchers.nearest_neighbor import NearestNeighbor

    matcher = NearestNeighbor({"do_mutual_check": True})
    f0 = extract_features.extract(superpoint, read_image(IMG0, True), SMALL_PRE)
    ret = match_features.match_images(matcher, f0, f0)
    n_valid = int(np.asarray(f0["mask"]).sum())
    assert len(ret["mconf"]) == n_valid
    np.testing.assert_allclose(ret["mkeypoints0"], ret["mkeypoints1"])


def test_batch_main_hdf5_roundtrip(tmp_path, superpoint):
    # stage the two images into an image dir
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    shutil.copy(IMG0, img_dir / "a.jpg")
    shutil.copy(IMG1, img_dir / "b.jpg")

    conf = {
        "output": "feats-test",
        "model": {"name": "superpoint", "max_keypoints": 256,
                  "keypoint_threshold": 1e-4},
        "preprocessing": SMALL_PRE,
    }
    fpath = extract_features.main(conf, img_dir, export_dir=tmp_path)
    assert fpath.exists()
    from imcui_tpu.utils.io import get_keypoints, list_h5_names

    names = sorted(list_h5_names(fpath))
    assert names == ["a.jpg", "b.jpg"]
    kp, unc = get_keypoints(fpath, "a.jpg", return_uncertainty=True)
    assert kp.ndim == 2 and kp.shape[1] == 2 and unc is not None

    # resumability: second run skips
    fpath2 = extract_features.main(conf, img_dir, export_dir=tmp_path)
    assert fpath2 == fpath

    # matching over a pairs list
    pairs = tmp_path / "pairs.txt"
    pairs.write_text("a.jpg b.jpg\n")
    mconf = {"output": "matches-test",
             "model": {"name": "nearest_neighbor", "do_mutual_check": True}}
    mpath = match_features.main(mconf, pairs, "feats-test",
                                export_dir=tmp_path)
    assert mpath.exists()
    from imcui_tpu.utils.io import get_matches

    matches, scores = get_matches(mpath, "a.jpg", "b.jpg")
    assert matches.ndim == 2 and matches.shape[1] == 2
    n_a = len(get_keypoints(fpath, "a.jpg"))
    n_b = len(get_keypoints(fpath, "b.jpg"))
    if len(matches):
        assert matches[:, 0].max() < n_a
        assert matches[:, 1].max() < n_b
