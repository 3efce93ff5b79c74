"""Exactness of the 2×2 space-to-channel conv folding (layers.fold2x2*).

The fold turns a 5×5 SAME stride-1 conv over (H, W, C) into a 3×3 conv
over (H/2, W/2, 4C) — the lane-occupancy trade used by the RoMa/DKM
scale-1 refiners (narrow-channel full convs at full resolution; see
imcui_tpu/models/matchers/roma.py refiner_apply). These tests pin:

- fold2x2/unfold2x2 round-trip,
- folded 5×5 / 1×1 conv and folded batch-norm against the unfolded ops,
- the whole refiner_apply chain folded vs unfolded (fold=True/False).
"""

import jax
import jax.numpy as jnp
import numpy as np

from imcui_tpu.models import layers as L
from imcui_tpu.models.matchers import roma


def test_fold_unfold_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (12, 16, 7))
    np.testing.assert_array_equal(L.unfold2x2(L.fold2x2(x)), x)


def test_fold2x2_conv5x5_exact():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (18, 22, 12))
    p = {"w": jax.random.normal(k2, (5, 5, 12, 24)) * 0.1,
         "b": jax.random.normal(k3, (24,))}
    ref = L.conv2d(p, x[None])[0]
    got = L.unfold2x2(L.conv2d(L.fold2x2_conv5x5(p), L.fold2x2(x)[None])[0])
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_fold2x2_conv1x1_and_bn_exact():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(k1, (10, 14, 24))
    p = {"w": jax.random.normal(k2, (1, 1, 24, 24)) * 0.1,
         "b": jax.random.normal(k3, (24,))}
    ref = L.conv2d(p, x[None])[0]
    got = L.unfold2x2(L.conv2d(L.fold2x2_conv1x1(p), L.fold2x2(x)[None])[0])
    np.testing.assert_allclose(got, ref, atol=1e-6)

    bn = {"mean": jax.random.normal(k2, (24,)),
          "var": jax.random.uniform(k3, (24,)) + 0.5,
          "scale": jax.random.normal(k1, (24,)),
          "bias": jax.random.normal(k2, (24,))}
    ref = L.batch_norm_inference(bn, x[None])[0]
    got = L.unfold2x2(
        L.batch_norm_inference(L.fold2x2_bn(bn), L.fold2x2(x)[None])[0])
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_refiner_apply_folded_matches_unfolded():
    cfg = roma.REFINERS["1"]  # dw=False → fold-eligible
    key = jax.random.PRNGKey(3)
    p = roma.init_refiner(key, cfg)
    h, w = 28, 36
    k1, k2, k3 = jax.random.split(key, 3)
    f0 = jax.random.normal(k1, (h, w, cfg["feat"]))
    f1 = jax.random.normal(k2, (h, w, cfg["feat"]))
    warp = roma.coord_grid(h, w).reshape(h, w, 2) \
        + 0.02 * jax.random.normal(k3, (h, w, 2))
    cert = jnp.zeros((h, w))
    wf, cf = roma.refiner_apply(p, cfg, f0, f1, warp, cert, fold=True)
    wu, cu = roma.refiner_apply(p, cfg, f0, f1, warp, cert, fold=False)
    np.testing.assert_allclose(wf, wu, atol=2e-6)
    np.testing.assert_allclose(cf, cu, rtol=2e-5, atol=2e-5)
