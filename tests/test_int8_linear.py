"""W8A8 dynamic-quantised linear (layers.quantize_linear_int8 / linear).

Pins: (1) dispatch — a quantised tree routes through the int8 path and
returns the caller's dtype; (2) approximation quality — per-channel
weight scales + per-row activation scales keep the relative error of a
single matmul within the int8 quantisation bound; (3) bias handling.
"""

import jax
import jax.numpy as jnp
import numpy as np

from imcui_tpu.models import layers as L


def test_int8_linear_close_to_f32():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    p = L.init_linear(k1, 256, 512)
    p["b"] = jax.random.normal(k3, (512,)) * 0.1
    x = jax.random.normal(k2, (64, 256))
    ref = L.linear(p, x)
    got = L.linear(L.quantize_linear_int8(p), x)
    assert got.dtype == x.dtype
    # int8 error bound: ~1/127 per operand; the matmul averages it down
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_int8_linear_batched_shapes_and_bf16():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    p = L.init_linear(k1, 128, 64)
    q = L.quantize_linear_int8(p)
    assert q["w_q"].dtype == jnp.int8 and q["w_s"].shape == (64,)
    x = jax.random.normal(k2, (3, 10, 128), jnp.bfloat16)
    got = L.linear(q, x)
    assert got.shape == (3, 10, 64) and got.dtype == jnp.bfloat16
    ref = L.linear(p, x.astype(jnp.float32))
    rel = (np.linalg.norm(got.astype(np.float32) - ref)
           / np.linalg.norm(ref))
    assert rel < 0.03, rel


def test_apply_precision_tree_selection():
    k = jax.random.PRNGKey(2)
    ks = jax.random.split(k, 5)
    tree = {
        "conv": {"w": jax.random.normal(ks[0], (3, 3, 32, 64)),
                 "b": jnp.zeros((64,))},
        "attn": {"qkv": L.init_linear(ks[1], 256, 768)},
        "head": {"w": jax.random.normal(ks[2], (256, 65))},  # narrow
        "norm": {"scale": jnp.ones((256,)), "bias": jnp.zeros((256,))},
        "idx": jnp.arange(8, dtype=jnp.int32),
        "blocks": [L.init_linear(ks[3], 512, 512),
                   L.init_linear(ks[4], 128, 128)],
    }
    q = L.apply_precision(tree, "int8")
    # wide linears quantised (dict and list positions alike)
    assert q["attn"]["qkv"]["w_q"].dtype == jnp.int8
    assert q["blocks"][0]["w_q"].dtype == jnp.int8
    # narrow linear, conv, norm: bf16-cast, never quantised
    assert "w_q" not in q["head"] and q["head"]["w"].dtype == jnp.bfloat16
    assert "w_q" not in q["blocks"][1]
    assert q["conv"]["w"].dtype == jnp.bfloat16
    assert q["norm"]["scale"].dtype == jnp.bfloat16
    # integer leaves untouched; identity for f32
    assert q["idx"].dtype == jnp.int32
    assert L.apply_precision(tree, None) is tree
    b = jax.tree_util.tree_leaves(L.apply_precision(tree, "bf16"))
    assert not any(a.dtype == jnp.int8 for a in b)


def test_apply_precision_encoder_stack_int8_cosine():
    """A 2-block dim-256 ViT encoder under int8 stays directionally
    faithful to the f32 forward (the full-size measurement is
    tools/try_vit_int8.py on hardware)."""
    from imcui_tpu.models.backbones import vit

    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    blocks = [vit.init_encoder_block(k, 256) for k in keys]
    x = jax.random.normal(jax.random.PRNGKey(4), (50, 256))

    def fwd(bs, h):
        for b in bs:
            h = vit.encoder_block_apply(b, h, 4)
        return h

    ref = np.asarray(fwd(blocks, x), np.float64).ravel()
    got = np.asarray(
        fwd(L.apply_precision(blocks, "int8"),
            x.astype(jnp.bfloat16)).astype(jnp.float32),
        np.float64).ravel()
    cos = ref @ got / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.99, cos


def test_apply_precision_duster_serving():
    """conf["precision"]="int8" flows through the Duster serving model:
    the wide projections are quantised and the forward stays finite."""
    from imcui_tpu.models.matchers.duster import Duster

    conf = {
        "enc_dim": 256, "enc_depth": 1, "enc_heads": 4,
        "dec_dim": 256, "dec_depth": 1, "dec_heads": 4,
        "patch": 16, "max_matches": 16, "subsample": 8,
        "pos_embed": "RoPE100", "head_type": "linear",
        "precision": "int8",
    }
    m = Duster(conf)
    leaves = jax.tree_util.tree_leaves(m.params)
    assert any(a.dtype == jnp.int8 for a in leaves)
    rng = np.random.RandomState(0)
    out = m({"image0": rng.rand(1, 3, 64, 96).astype(np.float32),
             "image1": rng.rand(1, 3, 64, 96).astype(np.float32)})
    assert np.isfinite(np.asarray(out["scores"], np.float32)).all()
    assert np.isfinite(np.asarray(out["keypoints0"], np.float32)).all()


def test_int8_weight_roundtrip_extremes():
    # columns with very different magnitudes must each use their own scale
    w = jnp.stack([jnp.linspace(-1e-3, 1e-3, 32),
                   jnp.linspace(-100.0, 100.0, 32)], -1)
    q = L.quantize_linear_int8({"w": w})
    back = q["w_q"].astype(jnp.float32) * q["w_s"]
    # exact bound: half a quantisation step per column
    bound = np.asarray(q["w_s"]) / 2 + 1e-9
    assert (np.abs(np.asarray(back - w)) <= bound[None, :]).all()


def test_int8_conv_close_to_f32():
    """W8A8 conv dispatch (layers.quantize_conv_int8 / conv2d): routed
    through the int8 path, caller dtype preserved, error within the
    int8 quantisation bound; strided + dilated variants agree with the
    f32 conv's torch-SAME geometry."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    p = L.init_conv(k1, 3, 3, 64, 128)
    x = jax.random.normal(k2, (2, 16, 20, 64))
    q = L.quantize_conv_int8(p)
    assert q["w_q"].dtype == jnp.int8 and q["w_s"].shape == (128,)
    for kw in ({}, {"stride": 2}, {"dilation": 2}):
        ref = L.conv2d(p, x, **kw)
        got = L.conv2d(q, x, **kw)
        assert got.shape == ref.shape and got.dtype == x.dtype
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.03, (kw, rel)
    # bf16 activations keep the caller dtype
    got = L.conv2d(q, x.astype(jnp.bfloat16))
    assert got.dtype == jnp.bfloat16


def test_apply_precision_conv_min_ch():
    """conv_min_ch opts convs into int8: wide convs quantised, narrow
    convs and depthwise (cin==1 per group) stay bf16; default (None)
    leaves every conv bf16 (the pre-r5 contract)."""
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    tree = {
        "wide": L.init_conv(ks[0], 3, 3, 128, 256),
        "narrow": L.init_conv(ks[1], 3, 3, 8, 24),
        "depthwise": {"w": jax.random.normal(ks[2], (5, 5, 1, 256))},
    }
    q = L.apply_precision(tree, "int8", conv_min_ch=64)
    assert q["wide"]["w_q"].dtype == jnp.int8
    assert "w_q" not in q["narrow"]
    assert "w_q" not in q["depthwise"]
    q0 = L.apply_precision(tree, "int8")
    assert all("w_q" not in q0[k] for k in tree)
