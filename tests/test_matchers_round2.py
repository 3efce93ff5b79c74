"""Contract tests for the round-1 closing matcher batch (reference
wrappers: imcui/hloc/matchers/{aspanformer,matchformer,topicfm,xoftr,
se2loftr,sphereglue,imp,omniglue,sold2,cotr,mickey,rdd_dense,romav2,
dad_roma,loma}.py + the jamma config)."""

import numpy as np
import pytest

from imcui_tpu.models import matchers
from imcui_tpu.utils.base_model import dynamic_load

DENSE = [
    ("aspanformer", {"max_keypoints": 128, "match_threshold": 0.001}),
    ("matchformer", {"max_keypoints": 128, "match_threshold": 1e-9}),
    ("topicfm", {"max_keypoints": 128, "match_threshold": 0.001}),
    ("xoftr", {"max_keypoints": 128, "match_threshold": 0.001}),
    ("se2loftr", {"max_keypoints": 128, "match_threshold": 0.001}),
    ("loma", {"max_keypoints": 128, "filter_threshold": 0.0}),
    ("jamma", {"max_keypoints": 128, "match_threshold": 1e-9}),
    ("romav2", {"max_keypoints": 128}),
    ("dad_roma", {"max_keypoints": 128}),
    ("rdd_dense", {"max_keypoints": 128, "match_threshold": 0.0}),
    ("cotr", {"match_threshold": 0.2}),
    ("mickey", {"match_threshold": 0.0}),
]


@pytest.fixture(scope="module")
def pair():
    rng = np.random.RandomState(0)
    i0 = rng.rand(1, 1, 128, 160).astype(np.float32)
    i1 = np.roll(i0, 8, axis=3)
    return i0, i1


@pytest.mark.parametrize("name,conf", DENSE)
def test_dense_matcher_contract(name, conf, pair):
    i0, i1 = pair
    model = dynamic_load(matchers, name)(conf)
    out = model({"image0": i0, "image1": i1})
    k0 = np.asarray(out["keypoints0"])
    k1 = np.asarray(out["keypoints1"])
    mask = np.asarray(out["mask"]).astype(bool)
    mconf = np.asarray(out["mconf"])
    assert k0.shape == k1.shape and k0.shape[-1] == 2
    assert mconf.shape == mask.shape
    if mask.any():
        v0 = k0[mask]
        assert v0[:, 0].min() >= 0 and v0[:, 0].max() <= 160
        assert v0[:, 1].min() >= 0 and v0[:, 1].max() <= 128


@pytest.mark.parametrize("name,ddim", [("sphereglue", 256), ("imp", 256)])
def test_sparse_matcher_contract(name, ddim):
    rng = np.random.RandomState(1)
    n = 64
    kp0 = rng.rand(1, n, 2).astype(np.float32) * 200
    kp1 = kp0 + 2.0
    d0 = rng.randn(1, n, ddim).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d1 = d0 + 0.05 * rng.randn(1, n, ddim).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    s = rng.rand(1, n).astype(np.float32)
    data = {
        "keypoints0": kp0, "keypoints1": kp1, "scores0": s, "scores1": s,
        "descriptors0": d0.transpose(0, 2, 1),
        "descriptors1": d1.transpose(0, 2, 1),
        "size0": np.array([[256, 256]], np.float32),
        "size1": np.array([[256, 256]], np.float32),
        "image0": np.zeros((1, 1, 256, 256), np.float32),
        "image1": np.zeros((1, 1, 256, 256), np.float32),
    }
    model = dynamic_load(matchers, name)({"match_threshold": 0.01})
    out = model(data)
    m0 = np.asarray(out["matches0"])
    ms0 = np.asarray(out["matching_scores0"])
    assert m0.shape == (1, n) and ms0.shape == (1, n)
    assert m0.max() < n
    # near-identical descriptors → many correct matches even untrained
    matched = m0[0][m0[0] > -1]
    idx = np.where(m0[0] > -1)[0]
    if len(idx) > 10:
        assert (matched == idx).mean() > 0.5


def test_omniglue_runs():
    rng = np.random.RandomState(2)
    i0 = rng.rand(1, 1, 168, 224).astype(np.float32)
    i1 = np.roll(i0, 6, axis=3)
    model = dynamic_load(matchers, "omniglue")(
        {"max_keypoints": 128, "match_threshold": 1e-6})
    out = model({"image0": i0, "image1": i1})
    assert np.asarray(out["keypoints0"]).shape == (1, 128, 2)


def test_sold2_lines_contract():
    rng = np.random.RandomState(3)
    img = np.zeros((160, 200), np.float32)
    img[40:42, 20:180] = 1.0
    img[40:120, 100:102] = 1.0
    img += 0.05 * rng.rand(160, 200).astype(np.float32)
    i0 = img[None, None]
    i1 = np.roll(i0, 5, axis=3)
    model = dynamic_load(matchers, "sold2")(
        {"detect_thresh": 0.01, "valid_thresh": 1e-4})
    out = model({"image0": i0, "image1": i1})
    assert out["raw_lines0"].ndim == 3 and out["raw_lines0"].shape[1:] \
        == (2, 2)
    assert out["lines0"].shape == out["lines1"].shape
    assert len(out["mconf"]) == len(out["lines0"])
    # matched line endpoints stay inside the image
    if len(out["lines0"]):
        assert out["lines0"][..., 0].max() <= 200
        assert out["lines0"][..., 1].max() <= 160


def test_loma_scan_respects_padding():
    """Padded tokens must not leak through the selective scan."""
    import jax
    import jax.numpy as jnp

    from imcui_tpu.models.matchers import loma

    p = loma.init_ssm_layer(jax.random.PRNGKey(0), 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 32))
    mask_full = jnp.ones((16,), bool)
    mask_half = mask_full.at[8:].set(False)
    y_full = loma.selective_scan(p, x, mask_full)
    # zero out the padded tail, mask it → the valid prefix must match a
    # run where the tail had arbitrary garbage
    x_garbage = x.at[8:].set(999.0)
    y_masked = loma.selective_scan(p, x_garbage, mask_half)
    # forward scan: prefix (causal) is unaffected by the masked tail
    assert np.allclose(np.asarray(y_full[:8]), np.asarray(y_masked[:8]),
                       atol=1e-4)
