"""Width-folded conv equivalence (layers.fold_conv3x3 & friends).

The folded layout is the round-2 throughput lever for the C=64 VGG
stages (BASELINE.md); these tests pin exact equivalence so the fast path
can never drift from the published SuperPoint semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from imcui_tpu.models import layers
from imcui_tpu.models.extractors import superpoint as sp


def test_fold_conv3x3_exact():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 24, 64), jnp.float32)
    p = {
        "w": jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64)) * 0.05,
        "b": jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.1,
    }
    y_ref = layers.conv2d(p, x)
    y_fold = layers.unfold_width(
        layers.conv2d(layers.fold_conv3x3(p), layers.fold_width(x)))
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-5)


def test_max_pool_folded_exact():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 16, 64))
    ref = layers.max_pool(x)
    got_unfolded = layers.max_pool_folded(layers.fold_width(x),
                                          refold=False)
    np.testing.assert_array_equal(np.asarray(got_unfolded), np.asarray(ref))
    got_folded = layers.unfold_width(
        layers.max_pool_folded(layers.fold_width(x), refold=True))
    np.testing.assert_array_equal(np.asarray(got_folded), np.asarray(ref))


def test_superpoint_backbone_folded_matches_plain():
    """The folded fast path (W%16==0) must equal the plain stage-1/2
    layout bit-for-bit up to conv reassociation."""
    params = sp.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 32, 32, 1))

    def plain_backbone(params, x):
        c = lambda n, a: layers.relu(layers.conv2d(params[n], a))
        y = c("conv1a", x)
        y = c("conv1b", y)
        y = layers.max_pool(y)
        y = c("conv2a", y)
        y = c("conv2b", y)
        y = layers.max_pool(y)
        y = c("conv3a", y)
        y = c("conv3b", y)
        y = layers.max_pool(y)
        y = c("conv4a", y)
        return c("conv4b", y)

    got = sp.backbone(params, x)      # W=32 → folded fast path
    ref = plain_backbone(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_pallas_stage_tail_interpret():
    """The fused Pallas stage tail must match the folded XLA path; runs
    in interpreter mode so CI exercises it without a TPU."""
    import pytest

    from imcui_tpu.ops import pallas_stage1 as ps1

    if ps1.pl is None:
        pytest.skip("pallas unavailable")
    key = jax.random.PRNGKey(0)
    pa = {"w": jax.random.normal(key, (3, 3, 1, 64)) * 0.3,
          "b": jax.random.normal(jax.random.PRNGKey(5), (64,)) * 0.1}
    pb = {"w": jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64)) * 0.05,
          "b": jax.random.normal(jax.random.PRNGKey(6), (64,)) * 0.1}
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 256, 1))
    fa = layers.fold_conv3x3(pa)
    fb = layers.fold_conv3x3(pb)
    y_raw = layers.conv2d({"w": fa["w"].astype(jnp.bfloat16)},
                          layers.fold_width(x).astype(jnp.bfloat16))
    h1 = layers.relu(y_raw + fa["b"].astype(jnp.bfloat16))
    z = layers.relu(layers.conv2d({"w": fb["w"].astype(jnp.bfloat16)},
                                  h1.astype(jnp.bfloat16)) + fb["b"])
    ref = layers.max_pool_folded(z, refold=True)
    got = ps1.stage_tail(y_raw.astype(jnp.bfloat16), fa["b"], fb["w"],
                         fb["b"], interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)


def test_pallas_stem_tail_interpret():
    """stem_tail (the rejected fused-conv1a kernel, kept as a documented
    negative result) must stay exact vs the XLA folded stage."""
    from imcui_tpu.ops import pallas_stage1 as ps1

    B, H, W = 2, 64, 96
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 1),
                           jnp.float32)
    pa = {"w": jax.random.normal(jax.random.PRNGKey(1), (3, 3, 1, 64)) * 0.3,
          "b": jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.1}
    pb = {"w": jax.random.normal(jax.random.PRNGKey(3), (3, 3, 64, 64)) * 0.05,
          "b": jax.random.normal(jax.random.PRNGKey(4), (64,)) * 0.1}
    fa = layers.fold_conv3x3(pa)
    fb = layers.fold_conv3x3(pb)
    y = layers.fold_width(x)
    ref = layers.max_pool_folded(
        jnp.maximum(layers.conv2d(
            fb, jnp.maximum(layers.conv2d(fa, y), 0)), 0))
    got = ps1.stem_tail(y.astype(jnp.bfloat16), fa["w"], fa["b"],
                        fb["w"], fb["b"], interpret=True)
    err = np.max(np.abs(np.asarray(ref, np.float32)
                        - np.asarray(got, np.float32)))
    rel = err / (np.max(np.abs(np.asarray(ref))) + 1e-9)
    assert got.shape == ref.shape
    assert rel < 0.02, rel


def test_vmap_pairs_b1_bypass_matches_vmap():
    """layers.vmap_pairs: the B=1 bypass (measured 98→81 ms/pair on
    RoMa, tools/try_roma_novmap.py) must be output-identical to vmap."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imcui_tpu.models import layers

    def fn(a, b):
        return {"s": (a * b).sum(-1), "d": a - 2.0 * b}

    rng = np.random.default_rng(3)
    for batch in (1, 3):
        a = jnp.asarray(rng.normal(size=(batch, 5, 4)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(batch, 5, 4)).astype(np.float32))
        want = jax.vmap(fn)(a, b)
        got = layers.vmap_pairs(fn)(a, b)
        for k in want:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(want[k]))
