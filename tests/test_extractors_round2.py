"""Contract tests for the round-1 closing extractor batch: lanet,
darkfeat, sfd2, liftfeat, rdd, ripe, rekd, fire, fire_local, raco
(reference wrappers: imcui/hloc/extractors/{lanet,darkfeat,sfd2,liftfeat,
rdd,ripe,rekd,fire,fire_local,raco}.py)."""

import numpy as np
import pytest

from imcui_tpu.models import extractors
from imcui_tpu.utils.base_model import dynamic_load

SPARSE = [
    ("lanet", {"max_keypoints": 64}, 256),
    ("darkfeat", {"max_keypoints": 64}, 128),
    ("sfd2", {"max_keypoints": 64}, 128),
    ("liftfeat", {"max_keypoints": 64}, 128),
    ("rdd", {"max_keypoints": 64}, 256),
    ("ripe", {"max_keypoints": 64}, 256),
    ("rekd", {"max_keypoints": 64}, 256),
    ("raco", {"max_num_keypoints": 64}, 128),
]


@pytest.mark.parametrize("name,conf,ddim", SPARSE)
def test_sparse_extractor_contract(name, conf, ddim):
    model = dynamic_load(extractors, name)(conf)
    img = np.random.RandomState(0).rand(1, 3, 96, 128).astype(np.float32)
    out = model({"image": img})
    kp = np.asarray(out["keypoints"])
    n = kp.shape[1]
    assert kp.shape == (1, n, 2)
    assert np.asarray(out["scores"]).shape == (1, n)
    assert np.asarray(out["descriptors"]).shape == (1, ddim, n)
    assert np.asarray(out["mask"]).shape == (1, n)
    mask = np.asarray(out["mask"])
    # valid keypoints stay inside the image
    if mask.any():
        valid = kp[mask]
        assert valid[:, 0].min() >= 0 and valid[:, 0].max() < 128
        assert valid[:, 1].min() >= 0 and valid[:, 1].max() < 96
    # descriptors of valid keypoints are unit norm
    d = np.asarray(out["descriptors"])[0].T[mask[0]]
    if len(d):
        assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)


def test_fire_global_descriptor():
    model = dynamic_load(extractors, "fire")({})
    img = np.random.RandomState(1).rand(1, 3, 96, 128).astype(np.float32)
    out = model({"image": img})
    g = np.asarray(out["global_descriptor"])
    assert g.shape == (1, 256)
    assert np.allclose(np.linalg.norm(g, axis=-1), 1.0, atol=1e-4)
    # descriptor is scale-aggregated — a resized image should stay close
    img2 = img[..., ::2, ::2].copy()
    g2 = np.asarray(model({"image": img2})["global_descriptor"])
    assert g @ g2.T > 0.5


def test_fire_local_superfeatures():
    model = dynamic_load(extractors, "fire_local")({"features_num": 16})
    img = np.random.RandomState(2).rand(1, 3, 96, 128).astype(np.float32)
    out = model({"image": img})
    lf = np.asarray(out["local_descriptor"])
    assert lf.shape == (1, 16, 256)
    assert np.allclose(np.linalg.norm(lf, axis=-1), 1.0, atol=1e-3)


def test_rekd_rotation_equivariant_scores():
    """The C4 group construction makes the detection score map exactly
    equivariant to 90° rotations (up to border effects)."""
    import jax.numpy as jnp

    from imcui_tpu.models.extractors import rekd as rk

    params = rk.init_params(__import__("jax").random.PRNGKey(0))
    img = np.random.RandomState(3).rand(1, 64, 64, 1).astype(np.float32)
    s0, _ = rk.backbone(params, jnp.asarray(img))
    s90, _ = rk.backbone(params, jnp.rot90(jnp.asarray(img), 1, (1, 2)))
    back = np.rot90(np.asarray(s90)[0], -1, (0, 1))
    crop = (slice(4, -4), slice(4, -4))
    assert np.allclose(np.asarray(s0)[0][crop], back[crop], atol=1e-4)
