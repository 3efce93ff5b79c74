"""Adaptive-depth LightGlue (reference parity: upstream exits early when
depth_confidence of tokens saturate; the assignment is read from the
head of the exit layer). The TPU shape is a lax.while_loop over stacked
layer params — these tests pin (a) full-depth equivalence with the
static path and (b) that a saturated confidence head actually exits
early through the right head."""

import jax
import jax.numpy as jnp
import numpy as np

from imcui_tpu.models.matchers import lightglue as lg

CONF = {"features": "custom", "descriptor_dim": 64, "num_heads": 4,
        "n_layers": 3, "add_scale_ori": False, "match_threshold": 0.1,
        "precision": "fp32", "depth_confidence": 0.95}


def _inputs(seed=0, n0=12, n1=10):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.uniform(0, 96, (n0, 2)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 96, (n1, 2)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(n0, 64)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(n1, 64)).astype(np.float32)),
        jnp.ones(n0, bool), jnp.ones(n1, bool),
        jnp.asarray([96.0, 80.0]), jnp.asarray([96.0, 80.0]),
    )


def test_full_depth_matches_static():
    """Random-init confidence heads never saturate, so the adaptive loop
    runs all layers and must reproduce the static forward exactly."""
    params = lg.init_params(jax.random.PRNGKey(5), CONF)
    args = _inputs()
    out_s = lg.forward_pair(params, *args, conf=CONF)
    out_a = lg.forward_pair_adaptive(params, *args, conf=CONF)
    assert int(out_a["stop_layer"]) == CONF["n_layers"]
    np.testing.assert_array_equal(np.asarray(out_s["matches0"]),
                                  np.asarray(out_a["matches0"]))
    np.testing.assert_allclose(np.asarray(out_s["matching_scores0"]),
                               np.asarray(out_a["matching_scores0"]),
                               atol=1e-6)


def test_saturated_confidence_exits_early():
    params = lg.init_params(jax.random.PRNGKey(5), CONF)
    # confidence after layer 0 ≈ sigmoid(+10) ≈ 1 for every token
    params["token_confidence"][0]["token"]["w"] = (
        params["token_confidence"][0]["token"]["w"] * 0)
    params["token_confidence"][0]["token"]["b"] = (
        params["token_confidence"][0]["token"]["b"] * 0 + 10.0)
    args = _inputs()
    out_a = lg.forward_pair_adaptive(params, *args, conf=CONF)
    assert int(out_a["stop_layer"]) == 1
    # must equal a 1-layer network read through layer 0's assignment head
    p1 = dict(params)
    p1["transformers"] = params["transformers"][:1]
    p1["log_assignment"] = params["log_assignment"][:1]
    p1["token_confidence"] = []
    out_1 = lg.forward_pair(p1, *args, conf={**CONF, "n_layers": 1})
    np.testing.assert_array_equal(np.asarray(out_1["matches0"]),
                                  np.asarray(out_a["matches0"]))
    np.testing.assert_allclose(np.asarray(out_1["matching_scores0"]),
                               np.asarray(out_a["matching_scores0"]),
                               atol=1e-6)


def test_depth_confidence_zero_is_static():
    params = lg.init_params(jax.random.PRNGKey(5), CONF)
    conf = {**CONF, "depth_confidence": 0}
    args = _inputs()
    out = lg.forward_pair_adaptive(params, *args, conf=conf)
    assert "stop_layer" not in out  # routed to the static path
