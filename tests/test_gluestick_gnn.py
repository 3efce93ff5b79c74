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
    """The wireframe message must pair endpoint 2i with 2i+1."""
    import jax
    import jax.numpy as jnp

    from imcui_tpu.models.matchers import gluestick as gs

    params = gs.init_gnn_params(jax.random.PRNGKey(0))
    p = params["layers"][0]
    n_kpts, n_lines = 4, 3
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (n_kpts + 2 * n_lines, gs.D_MODEL))
    mask = jnp.ones((2 * n_lines,), bool)
    y = gs._line_message(p, x, n_kpts, n_lines, mask)
    # keypoint tokens pass through untouched
    assert np.allclose(np.asarray(y[:n_kpts]), np.asarray(x[:n_kpts]))
    # endpoint update depends on the partner endpoint: changing endpoint
    # 2i+1 must change endpoint 2i's output (and not other lines')
    x2 = x.at[n_kpts + 1].add(1.0)
    y2 = gs._line_message(p, x2, n_kpts, n_lines, mask)
    assert not np.allclose(np.asarray(y2[n_kpts]), np.asarray(y[n_kpts]))
    assert np.allclose(np.asarray(y2[n_kpts + 2:n_kpts + 6]),
                       np.asarray(y[n_kpts + 2:n_kpts + 6]))
