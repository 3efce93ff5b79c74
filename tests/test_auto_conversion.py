"""convert_state_dict_auto: the shared rank-based torch→JAX converter
(utils/weights.py) — the engine future per-model load_params build on."""

import numpy as np

from imcui_tpu.utils.weights import convert_state_dict_auto


def test_rank_based_transforms():
    sd = {
        "backbone.conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
        "backbone.conv1.bias": np.zeros((64,), np.float32),
        "backbone.bn1.weight": np.ones((64,), np.float32),
        "backbone.bn1.bias": np.zeros((64,), np.float32),
        "backbone.bn1.running_mean": np.zeros((64,), np.float32),
        "backbone.bn1.running_var": np.ones((64,), np.float32),
        "backbone.bn1.num_batches_tracked": np.zeros((), np.int64),
        "head.fc.weight": np.zeros((10, 64), np.float32),
        "head.fc.bias": np.zeros((10,), np.float32),
        "norm.weight": np.ones((64,), np.float32),
        "norm.bias": np.zeros((64,), np.float32),
        "temp": np.asarray(0.1, np.float32),
    }
    t = convert_state_dict_auto(sd)
    # conv: OIHW → HWIO; bias → b
    assert t["backbone"]["conv1"]["w"].shape == (7, 7, 3, 64)
    assert t["backbone"]["conv1"]["b"].shape == (64,)
    # batch norm detected from running_mean sibling
    bn = t["backbone"]["bn1"]
    assert set(bn) == {"scale", "bias", "mean", "var"}
    # linear: transpose; bias → b
    assert t["head"]["fc"]["w"].shape == (64, 10)
    assert t["head"]["fc"]["b"].shape == (10,)
    # layer-norm affine (1-D weight sibling): weight→scale, bias→bias
    assert set(t["norm"]) == {"scale", "bias"}
    # raw scalar passes through under its own name
    assert float(t["temp"]) == np.float32(0.1)


def test_layer_stack_listification():
    sd = {}
    for i in range(3):
        sd[f"encoder.layers.{i}.q.weight"] = np.zeros((8, 8), np.float32)
    t = convert_state_dict_auto(sd, list_keys=("layers",))
    layers = t["encoder"]["layers"]
    assert isinstance(layers, list) and len(layers) == 3
    assert layers[2]["q"]["w"].shape == (8, 8)
