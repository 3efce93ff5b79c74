"""Contract tests for the additional extractors (SIFT, DISK, NetVLAD)."""

import numpy as np
import pytest

from imcui_tpu.utils.image import read_image

IMG0 = "/root/reference/tests/data/02928139_3448003521.jpg"


def test_sift_extractor_contract():
    from imcui_tpu.models.extractors.sift import SIFT

    model = SIFT({"max_keypoints": 512})
    img = read_image(IMG0, grayscale=True).astype(np.float32) / 255.0
    out = model({"image": img[None, None]})
    assert out["keypoints"].shape == (1, 512, 2)
    assert out["descriptors"].shape == (1, 128, 512)
    n = out["mask"].sum()
    assert n > 100
    # rootsift descriptors are unit-norm
    d = out["descriptors"][0][:, out["mask"][0]]
    np.testing.assert_allclose(np.linalg.norm(d, axis=0), 1.0, atol=1e-3)
    # scales / oris present (needed by sift-lightglue)
    assert (out["scales"][0][out["mask"][0]] > 0).all()


def test_sift_matches_self():
    from imcui_tpu.models.extractors.sift import SIFT
    from imcui_tpu.ops.matching import mutual_nn_match

    import jax.numpy as jnp

    model = SIFT({"max_keypoints": 256})
    img = read_image(IMG0, grayscale=True).astype(np.float32) / 255.0
    out = model({"image": img[None, None]})
    d = out["descriptors"][0].T
    m = out["mask"][0]
    res = mutual_nn_match(jnp.asarray(d), jnp.asarray(d),
                          mask0=jnp.asarray(m), mask1=jnp.asarray(m))
    matches = np.asarray(res["matches0"])
    idx = np.where(m)[0]
    assert (matches[idx] == idx).mean() > 0.95


def test_disk_contract(rng):
    from imcui_tpu.models.extractors.disk import DISK

    model = DISK({"max_keypoints": 256, "detection_threshold": -1e9})
    img = rng.rand(1, 3, 96, 128).astype(np.float32)
    out = model({"image": img})
    assert np.asarray(out["keypoints"]).shape == (1, 256, 2)
    assert np.asarray(out["descriptors"]).shape == (1, 128, 256)
    mask = np.asarray(out["mask"][0])
    assert mask.sum() > 50
    kp = np.asarray(out["keypoints"][0])[mask]
    assert (kp[:, 0] < 128).all() and (kp[:, 1] < 96).all()
    d = np.asarray(out["descriptors"][0])[:, mask]
    np.testing.assert_allclose(np.linalg.norm(d, axis=0), 1.0, atol=1e-3)


def test_netvlad_contract(rng):
    from imcui_tpu.models.extractors.netvlad import NetVLAD

    model = NetVLAD({})
    img = rng.rand(2, 3, 64, 96).astype(np.float32)
    out = model({"image": img})
    g = np.asarray(out["global_descriptor"])
    assert g.shape == (2, 4096)
    np.testing.assert_allclose(np.linalg.norm(g, axis=1), 1.0, atol=1e-4)
    # similar image → higher similarity than a different one
    img_same = img[0:1] + rng.randn(1, 3, 64, 96).astype(np.float32) * 0.01
    g2 = np.asarray(model({"image": img_same})["global_descriptor"])
    sim_same = float(g[0] @ g2[0])
    sim_diff = float(g[0] @ g[1])
    assert sim_same > sim_diff


def test_alike_contract(rng):
    from imcui_tpu.models.extractors.alike import Alike

    model = Alike({"max_keypoints": 128, "detection_threshold": 1e-6})
    out = model({"image": rng.rand(1, 3, 96, 128).astype(np.float32)})
    mask = np.asarray(out["mask"][0])
    assert mask.sum() > 50
    kp = np.asarray(out["keypoints"][0])[mask]
    assert (kp[:, 0] < 128).all() and (kp[:, 1] < 96).all()
    d = np.asarray(out["descriptors"][0])[:, mask]
    np.testing.assert_allclose(np.linalg.norm(d, axis=0), 1.0, atol=1e-3)


def test_cosplace_retrieval_contract(rng):
    from imcui_tpu.models.extractors.cosplace import CosPlace

    model = CosPlace({})
    out = model({"image": rng.rand(2, 3, 64, 96).astype(np.float32)})
    g = np.asarray(out["global_descriptor"])
    assert g.shape == (2, 2048)
    np.testing.assert_allclose(np.linalg.norm(g, axis=1), 1.0, atol=1e-4)


def test_aliked_sddh_contract(rng):
    from imcui_tpu.models.extractors.aliked import ALIKED

    model = ALIKED({"max_num_keypoints": 128,
                    "detection_threshold": 1e-6})
    out = model({"image": rng.rand(1, 3, 96, 128).astype(np.float32)})
    mask = np.asarray(out["mask"][0])
    assert mask.sum() > 50
    d = np.asarray(out["descriptors"][0])[:, mask]
    np.testing.assert_allclose(np.linalg.norm(d, axis=0), 1.0, atol=1e-3)


def test_dedode_contract(rng):
    from imcui_tpu.models.extractors.dedode import DeDoDe

    model = DeDoDe({"max_keypoints": 128})
    out = model({"image": rng.rand(1, 3, 96, 128).astype(np.float32)})
    mask = np.asarray(out["mask"][0])
    assert mask.sum() > 50
    d = np.asarray(out["descriptors"][0])[:, mask]
    np.testing.assert_allclose(np.linalg.norm(d, axis=0), 1.0, atol=1e-3)
