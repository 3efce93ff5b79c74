"""GlueStick joint point+line GNN path (reference:
imcui/hloc/matchers/gluestick.py:16-99 — GNN over keypoints AND line
endpoints)."""

import numpy as np


def _structured_pair():
    rng = np.random.RandomState(0)
    img = np.zeros((160, 200), np.float32)
    img[40:42, 20:180] = 1.0
    img[40:120, 100:102] = 1.0
    img[100:102, 30:170] = 1.0
    img += 0.05 * rng.rand(160, 200).astype(np.float32)
    i0 = img[None, None]
    return i0, np.roll(i0, 5, axis=3)


def test_gnn_path_contract():
    from imcui_tpu.models import matchers
    from imcui_tpu.utils.base_model import dynamic_load

    i0, i1 = _structured_pair()
    m = dynamic_load(matchers, "gluestick")({
        "max_keypoints": 128, "max_lines": 32, "use_gnn": True,
        "match_threshold": 0.0})
    out = m({"image0": i0, "image1": i1})
    assert out["keypoints0"].shape == out["keypoints1"].shape
    assert out["lines0"].shape == out["lines1"].shape
    assert out["raw_lines0"].shape[2:] == (2, 2)  # (1, L, 2, 2)
    # GNN and voting paths expose the identical output contract
    m2 = dynamic_load(matchers, "gluestick")({
        "max_keypoints": 128, "max_lines": 32})
    out2 = m2({"image0": i0, "image1": i1})
    assert set(out2.keys()) == set(out.keys())
    assert not m2.use_gnn  # auto mode stays off without a checkpoint


def test_line_message_passing_swaps_endpoints():
    """The wireframe message must pair endpoint 2i with 2i+1 and leave
    junctions that anchor no line untouched."""
    import jax
    import jax.numpy as jnp

    from imcui_tpu.models.matchers import gluestick as gs

    params = gs.init_gnn_params(jax.random.PRNGKey(0))
    p = params["gnn"]["line_layers"][0]
    n_kpts, n_lines = 4, 3
    t = n_kpts + 2 * n_lines
    x = jax.random.normal(jax.random.PRNGKey(1), (t, gs.D_MODEL))
    line_enc = jax.random.normal(jax.random.PRNGKey(2),
                                 (2 * n_lines, gs.D_MODEL))
    jidx = jnp.asarray(n_kpts + np.arange(2 * n_lines), jnp.int32)
    mask = jnp.ones((n_lines,), bool)
    y = gs._line_message(p, x, line_enc, jidx, mask)
    # keypoint tokens (no anchored line) pass through untouched
    assert np.allclose(np.asarray(y[:n_kpts]), np.asarray(x[:n_kpts]))
    # endpoint update depends on the partner endpoint: changing endpoint
    # 2i+1 must change endpoint 2i's output (and not other lines')
    x2 = x.at[n_kpts + 1].add(1.0)
    y2 = gs._line_message(p, x2, line_enc, jidx, mask)
    assert not np.allclose(np.asarray(y2[n_kpts]), np.asarray(y[n_kpts]))
    assert np.allclose(np.asarray(y2[n_kpts + 2:n_kpts + 4]),
                       np.asarray(y[n_kpts + 2:n_kpts + 4]))


def test_gluestick_gnn_conversion_roundtrip():
    """Synthetic upstream-named state_dict (matcher.* prefix, Conv1d
    MLPs, BN stats, bin scores) converts onto the GNN tree exactly —
    the checkpoint_GlueStick_MD.tar mapping path (VERDICT r2 #6)."""
    import jax

    from imcui_tpu.models.matchers import gluestick as gs
    from imcui_tpu.utils.weights import (assert_tree_matches,
                                         convert_state_dict_auto,
                                         normalize_state_dict,
                                         prune_to_tree,
                                         tree_to_state_dict)

    params = gs.init_gnn_params(jax.random.PRNGKey(3))
    sd = tree_to_state_dict(params)
    # emulate the TwoViewPipeline layout: matcher.* + extractor extras,
    # Conv1d weights with a trailing singleton kernel dim
    up = {}
    for k, v in sd.items():
        if v.ndim == 2 and ("encoder" in k or "proj" in k
                            or "merge" in k or "mlp" in k):
            v = v[..., None]  # torch Conv1d (cout, cin, 1)
        up[f"matcher.{k}"] = v
    up["extractor.sp.conv1a.weight"] = np.zeros((4, 1, 3, 3), np.float32)
    up = normalize_state_dict(up, rename=((r"^matcher\.", ""),),
                              drop=(r"^extractor\.",))
    tree = prune_to_tree(convert_state_dict_auto(up), params)
    assert_tree_matches(tree, params, "gluestick")
    a = jax.tree_util.tree_leaves(tree)
    b = jax.tree_util.tree_leaves(params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))
