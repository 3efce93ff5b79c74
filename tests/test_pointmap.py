"""DUSt3R/MASt3R contract tests (tiny config through the real code path)."""

import numpy as np
import pytest

TINY = {
    "enc_dim": 64, "enc_depth": 2, "enc_heads": 4,
    "dec_dim": 64, "dec_depth": 2, "dec_heads": 4,
    "patch": 16, "max_matches": 64, "subsample": 8,
    "pos_embed": "RoPE100", "head_type": "linear",
}


@pytest.fixture(scope="module")
def duster():
    from imcui_tpu.models.matchers.duster import Duster

    return Duster(TINY)


def make_pair(rng, h=64, w=96):
    return {
        "image0": rng.rand(1, 3, h, w).astype(np.float32),
        "image1": rng.rand(1, 3, h, w).astype(np.float32),
    }


def test_duster_contract(duster, rng):
    out = duster(make_pair(rng))
    k0 = np.asarray(out["keypoints0"])
    assert k0.shape == (1, 64, 2)
    assert np.asarray(out["scores"]).shape == (1, 64)
    mask = np.asarray(out["mask"][0])
    if mask.any():
        kp = k0[0][mask]
        assert (kp[:, 0] < 96).all() and (kp[:, 1] < 64).all()


def test_reciprocal_nn_3d_identity(rng):
    """Identical pointmaps → reciprocal 3-D NN must map every confident
    cell to itself (the two model heads differ by design, so this invariant
    is tested at the op level)."""
    import jax.numpy as jnp

    from imcui_tpu.models.matchers.duster import reciprocal_nn_3d

    pts = rng.randn(32, 48, 3).astype(np.float32)
    conf = 1.0 + rng.rand(32, 48).astype(np.float32)  # all > conf floor
    k0, k1, score, valid = reciprocal_nn_3d(
        jnp.asarray(pts), jnp.asarray(pts.copy()),
        jnp.asarray(conf), jnp.asarray(conf.copy()),
        max_matches=24, subsample=8,
    )
    valid = np.asarray(valid)
    assert valid.sum() == 24
    np.testing.assert_array_equal(np.asarray(k0)[valid],
                                  np.asarray(k1)[valid])


def test_duster_deterministic(duster, rng):
    data = make_pair(rng)
    out1 = duster(data)
    out2 = duster({k: v.copy() for k, v in data.items()})
    np.testing.assert_array_equal(np.asarray(out1["keypoints0"]),
                                  np.asarray(out2["keypoints0"]))
    np.testing.assert_array_equal(np.asarray(out1["mask"]),
                                  np.asarray(out2["mask"]))


def test_mast3r_contract(rng):
    from imcui_tpu.models.matchers.mast3r import Mast3r

    m = Mast3r(TINY)
    img = rng.rand(1, 3, 64, 96).astype(np.float32)
    out = m({"image0": img, "image1": img.copy()})
    k0 = np.asarray(out["keypoints0"])
    # full-res descriptor map subsampled every 8 px → 8×12 = 96 cells,
    # top max_matches=64 kept
    assert k0.shape == (1, 64, 2)
    assert np.asarray(out["mask"][0]).shape == (64,)


def test_duster_dpt_head(rng):
    """The published DPT pointmap head: dense full-res output through the
    hook pyramid (exercised at tiny dims; conversion shares this tree)."""
    from imcui_tpu.models.matchers.duster import Duster

    conf = {**TINY, "head_type": "dpt"}
    m = Duster(conf)
    img = rng.rand(1, 3, 64, 96).astype(np.float32)
    out = m({"image0": img, "image1": img.copy()})
    assert np.asarray(out["keypoints0"]).shape == (1, 64, 2)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_resize_align_corners_matmul_vs_gather():
    """The r4 matmul-form resize (constant interpolation matrices +
    MXU einsums) must reproduce the gather-form torch
    F.interpolate(align_corners=True) semantics it replaced."""
    import jax.numpy as jnp
    import numpy as np

    from imcui_tpu.models.backbones import dpt

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(13, 17, 6)).astype(np.float32))

    def gather_ref(x, out_hw):
        h, w = x.shape[:2]
        oh, ow = out_hw
        ys = jnp.linspace(0.0, h - 1.0, oh)
        xs = jnp.linspace(0.0, w - 1.0, ow)
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        fy = (ys - y0)[:, None, None]
        fx = (xs - x0)[None, :, None]
        top = x[y0][:, x0] * (1 - fx) + x[y0][:, x1] * fx
        bot = x[y1][:, x0] * (1 - fx) + x[y1][:, x1] * fx
        return top * (1 - fy) + bot * fy

    for out_hw in ((26, 34), (26, 17), (7, 9), (13, 17)):
        got = np.asarray(dpt.resize_align_corners(x, out_hw))
        want = np.asarray(gather_ref(x, out_hw))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
