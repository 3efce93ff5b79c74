"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY §4: the JAX fake-backend idiom)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imcui_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_mesh_shapes(eight_devices):
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    mesh1 = mesh_lib.make_mesh(8, model_parallel=1)
    assert mesh1.shape["data"] == 8


def test_shard_batch_places_on_devices(eight_devices):
    mesh = mesh_lib.make_mesh(8, model_parallel=1)
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    xs = mesh_lib.shard_batch([x], mesh)[0]
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_dp_matches_single_device(eight_devices):
    """The sharded two-view step must produce the same results as the
    unsharded one."""
    from imcui_tpu.pipeline import two_view

    params = two_view.init_params(n_layers=2, max_keypoints=64)
    b, h, w = 4, 64, 64
    key = jax.random.PRNGKey(0)
    im0 = jax.random.uniform(key, (b, 1, h, w))
    im1 = jax.random.uniform(jax.random.PRNGKey(1), (b, 1, h, w))
    valid = jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))

    step = two_view.make_jitted_step(
        max_keypoints=64, n_layers=2, num_hypotheses=64,
        keypoint_threshold=1e-6,
    )
    ref = step(params, im0, im1, valid, valid, key)

    mesh = mesh_lib.make_mesh(4, model_parallel=1)
    p_sh = mesh_lib.shard_flagship_params(params, mesh)
    im0s, im1s, vs = mesh_lib.shard_batch([im0, im1, valid], mesh)
    with mesh:
        out = step(p_sh, im0s, im1s, vs, vs, key)
    np.testing.assert_array_equal(
        np.asarray(out["matches0"]), np.asarray(ref["matches0"])
    )
    np.testing.assert_allclose(
        np.asarray(out["keypoints0"]), np.asarray(ref["keypoints0"]),
        atol=1e-5,
    )


def test_tp_matches_single_device(eight_devices):
    """Tensor-parallel LightGlue (hidden dims sharded over the model axis)
    must agree with the replicated run."""
    from imcui_tpu.pipeline import two_view

    params = two_view.init_params(n_layers=2, max_keypoints=64)
    b, h, w = 2, 64, 64
    key = jax.random.PRNGKey(0)
    im0 = jax.random.uniform(key, (b, 1, h, w))
    im1 = jax.random.uniform(jax.random.PRNGKey(1), (b, 1, h, w))
    valid = jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))

    step = two_view.make_jitted_step(
        max_keypoints=64, n_layers=2, num_hypotheses=64,
        keypoint_threshold=1e-6,
    )
    ref = step(params, im0, im1, valid, valid, key)

    mesh = mesh_lib.make_mesh(4, model_parallel=2)
    p_sh = mesh_lib.shard_flagship_params(params, mesh)
    im0s, im1s, vs = mesh_lib.shard_batch([im0, im1, valid], mesh)
    with mesh:
        out = step(p_sh, im0s, im1s, vs, vs, key)
    np.testing.assert_array_equal(
        np.asarray(out["matches0"]), np.asarray(ref["matches0"])
    )


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry.__wrapped__() if hasattr(g.entry, "__wrapped__") else (None, None)
    # entry() builds a 512px/9-layer program — too slow for unit tests;
    # compile-check a lowered version instead
    import functools

    from imcui_tpu.pipeline import two_view

    params = two_view.init_params(n_layers=1, max_keypoints=32)
    step = functools.partial(
        two_view.match_step, max_keypoints=32, n_layers=1,
        num_hypotheses=16,
    )
    key = jax.random.PRNGKey(0)
    im = jax.random.uniform(key, (1, 1, 64, 64))
    valid = jnp.asarray([[64, 64]], jnp.int32)
    lowered = jax.jit(
        lambda p, a, b: step(p, a, b, valid, valid, key)
    ).lower(params, im, im)
    assert lowered.compile() is not None


def test_duster_tp_exactness(eight_devices):
    """ViT-L-class tp (VERDICT r1 item 7): DUSt3R at reduced depth,
    sharded dp=2 × tp=2 with remat, must match the single-device run."""
    from imcui_tpu.models.matchers import duster as duster_mod

    dconf = {
        "enc_dim": 64, "enc_depth": 2, "enc_heads": 4,
        "dec_dim": 64, "dec_depth": 2, "dec_heads": 4,
        "patch": 16, "pos_embed": "RoPE100", "head_type": "linear",
        "max_matches": 32, "subsample": 8, "remat": True,
    }
    conf_key = tuple(sorted(dconf.items()))
    params = duster_mod.init_params(jax.random.PRNGKey(1), dconf)
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (2, 48, 48, 3))

    ref = duster_mod._apply_batched(params, imgs, imgs, conf_key)

    mesh = mesh_lib.make_mesh(4, model_parallel=2)
    sparams = mesh_lib.shard_duster_params(params, mesh)
    simgs = mesh_lib.shard_batch([imgs], mesh)[0]
    with mesh:
        got = duster_mod._apply_batched(sparams, simgs, simgs, conf_key)
    np.testing.assert_allclose(
        np.asarray(got["keypoints0"]), np.asarray(ref["keypoints0"]),
        atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got["scores"]), np.asarray(ref["scores"]),
        rtol=1e-3, atol=1e-4)


def test_roma_tp_exactness(eight_devices):
    """RoMa tier (VERDICT r2 heavy-tier scaling axis): the published
    DINOv2+GP architecture at the tiny variant, sharded dp=2 × tp=2
    (DINOv2 + embedding-decoder blocks megatron-split, refiners
    replicated), must match the single-device run."""
    from imcui_tpu.models.matchers import roma as roma_mod

    conf = {"dinov2_variant": "test", "gp_dim": 512}
    conf_key = tuple(sorted(conf.items()))
    params = roma_mod.init_params(jax.random.PRNGKey(0), conf)
    imgs0 = jax.random.uniform(jax.random.PRNGKey(1), (2, 112, 112, 3))
    imgs1 = jax.random.uniform(jax.random.PRNGKey(2), (2, 112, 112, 3))

    ref = roma_mod._apply_batched(params, imgs0, imgs1, 32, conf_key)

    mesh = mesh_lib.make_mesh(4, model_parallel=2)
    sparams = mesh_lib.shard_roma_params(params, mesh)
    s0, s1 = mesh_lib.shard_batch([imgs0, imgs1], mesh)
    with mesh:
        got = roma_mod._apply_batched(sparams, s0, s1, 32, conf_key)
    np.testing.assert_allclose(
        np.asarray(got["keypoints0"]), np.asarray(ref["keypoints0"]),
        atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got["scores"]), np.asarray(ref["scores"]),
        rtol=1e-3, atol=1e-4)
