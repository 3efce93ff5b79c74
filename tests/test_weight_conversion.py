"""Weight-conversion dry runs: synthetic torch state_dicts with the exact
upstream names/shapes must convert into our param trees and produce
numerics matching a torch forward where cheap to express.

This catches conversion bugs offline — the real checkpoints only differ in
values.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")  # runtime stays torch-free; CI may too


def _save(sd, tmp_path, name):
    path = tmp_path / name
    torch.save(sd, path)
    return path


def make_superpoint_sd(rng):
    specs = [
        ("conv1a", 1, 64, 3), ("conv1b", 64, 64, 3),
        ("conv2a", 64, 64, 3), ("conv2b", 64, 64, 3),
        ("conv3a", 64, 128, 3), ("conv3b", 128, 128, 3),
        ("conv4a", 128, 128, 3), ("conv4b", 128, 128, 3),
        ("convPa", 128, 256, 3), ("convPb", 256, 65, 1),
        ("convDa", 128, 256, 3), ("convDb", 256, 256, 1),
    ]
    sd = {}
    for name, cin, cout, k in specs:
        sd[f"{name}.weight"] = torch.tensor(
            rng.randn(cout, cin, k, k).astype(np.float32) * 0.1)
        sd[f"{name}.bias"] = torch.tensor(
            rng.randn(cout).astype(np.float32) * 0.01)
    return sd


def test_superpoint_conversion_numerics(tmp_path, rng, monkeypatch):
    """Converted conv weights must reproduce a torch conv forward."""
    import torch.nn.functional as F

    from imcui_tpu.models.extractors import superpoint as sp
    from imcui_tpu.utils import weights as W

    sd = make_superpoint_sd(rng)
    path = _save(sd, tmp_path, "superpoint_v1.pth")
    monkeypatch.setattr(W, "download_checkpoint", lambda *a, **k: path)
    monkeypatch.setattr(sp, "download_checkpoint", lambda *a, **k: path)

    params, meta = sp.load_params({})
    assert meta["pretrained"]

    # numerics: first two convs vs torch
    import jax.numpy as jnp

    x = rng.rand(1, 1, 32, 40).astype(np.float32)
    with torch.no_grad():
        t = F.relu(F.conv2d(torch.tensor(x), sd["conv1a.weight"],
                            sd["conv1a.bias"], padding=1))
        t = F.relu(F.conv2d(t, sd["conv1b.weight"], sd["conv1b.bias"],
                            padding=1))
    from imcui_tpu.models.layers import conv2d, relu

    import jax

    with jax.default_matmul_precision("highest"):
        j = relu(conv2d(params["conv1a"],
                        jnp.asarray(x.transpose(0, 2, 3, 1))))
        j = relu(conv2d(params["conv1b"], j))
    np.testing.assert_allclose(
        np.asarray(j).transpose(0, 3, 1, 2), t.numpy(), atol=2e-4
    )


def make_lightglue_sd(rng, n_layers=2, dim=256, input_dim=256):
    def lin(dout, din, bias=True):
        out = {"weight": torch.tensor(
            rng.randn(dout, din).astype(np.float32) * 0.05)}
        if bias:
            out["bias"] = torch.tensor(
                rng.randn(dout).astype(np.float32) * 0.01)
        return out

    sd = {}

    def put(prefix, t):
        for k, v in t.items():
            sd[f"{prefix}.{k}"] = v

    put("input_proj", lin(dim, input_dim))
    sd["posenc.Wr.weight"] = torch.tensor(
        rng.randn(dim // 4 // 2, 2).astype(np.float32))
    for i in range(n_layers):
        base = f"transformers.{i}"
        put(f"{base}.self_attn.Wqkv", lin(3 * dim, dim))
        put(f"{base}.self_attn.out_proj", lin(dim, dim))
        put(f"{base}.self_attn.ffn.0", lin(2 * dim, 2 * dim))
        sd[f"{base}.self_attn.ffn.1.weight"] = torch.ones(2 * dim)
        sd[f"{base}.self_attn.ffn.1.bias"] = torch.zeros(2 * dim)
        put(f"{base}.self_attn.ffn.3", lin(dim, 2 * dim))
        put(f"{base}.cross_attn.to_qk", lin(dim, dim))
        put(f"{base}.cross_attn.to_v", lin(dim, dim))
        put(f"{base}.cross_attn.to_out", lin(dim, dim))
        put(f"{base}.cross_attn.ffn.0", lin(2 * dim, 2 * dim))
        sd[f"{base}.cross_attn.ffn.1.weight"] = torch.ones(2 * dim)
        sd[f"{base}.cross_attn.ffn.1.bias"] = torch.zeros(2 * dim)
        put(f"{base}.cross_attn.ffn.3", lin(dim, 2 * dim))
        # adaptive-depth confidence heads (upstream has n_layers-1;
        # the extra one this loop adds for the last layer is ignored)
        put(f"token_confidence.{i}.token.0", lin(1, dim))
    for i in range(n_layers):
        put(f"log_assignment.{i}.matchability", lin(1, dim))
        put(f"log_assignment.{i}.final_proj", lin(dim, dim))
    return sd


def test_lightglue_conversion_tree(tmp_path, rng, monkeypatch):
    from imcui_tpu.models.matchers import lightglue as lg

    sd = make_lightglue_sd(rng, n_layers=2)
    path = _save(sd, tmp_path, "superpoint_lightglue.pth")
    monkeypatch.setattr(lg, "download_checkpoint", lambda *a, **k: path)

    conf = {"features": "superpoint", "descriptor_dim": 256,
            "num_heads": 4, "n_layers": 2, "add_scale_ori": False,
            "model_name": "superpoint_lightglue.pth"}
    params, meta = lg.load_params(conf)
    assert meta["pretrained"]
    # spot numerics: input_proj behaves like the torch linear
    import jax.numpy as jnp

    x = rng.randn(5, 256).astype(np.float32)
    want = x @ sd["input_proj.weight"].numpy().T \
        + sd["input_proj.bias"].numpy()
    from imcui_tpu.models.layers import linear

    got = np.asarray(linear(params["input_proj"], jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)
    # every per-layer assignment head and confidence head converts
    np.testing.assert_allclose(
        np.asarray(params["log_assignment"][1]["final_proj"]["w"]),
        sd["log_assignment.1.final_proj.weight"].numpy().T, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["token_confidence"][0]["token"]["w"]),
        sd["token_confidence.0.token.0.weight"].numpy().T, atol=1e-6,
    )


def make_superglue_sd(rng):
    sd = {}

    def conv1d(prefix, cout, cin):
        sd[f"{prefix}.weight"] = torch.tensor(
            rng.randn(cout, cin, 1).astype(np.float32) * 0.05)
        sd[f"{prefix}.bias"] = torch.tensor(
            rng.randn(cout).astype(np.float32) * 0.01)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.ones(c)
        sd[f"{prefix}.bias"] = torch.zeros(c)
        sd[f"{prefix}.running_mean"] = torch.zeros(c)
        sd[f"{prefix}.running_var"] = torch.ones(c)
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    chans = [3, 32, 64, 128, 256, 256]
    idx = 0
    for i in range(1, len(chans)):
        conv1d(f"kenc.encoder.{idx}", chans[i], chans[i - 1])
        idx += 1
        if i < len(chans) - 1:
            bn(f"kenc.encoder.{idx}", chans[i])
            idx += 2
    for li in range(4):
        for j in range(3):
            conv1d(f"gnn.layers.{li}.attn.proj.{j}", 256, 256)
        conv1d(f"gnn.layers.{li}.attn.merge", 256, 256)
        conv1d(f"gnn.layers.{li}.mlp.0", 512, 512)
        bn(f"gnn.layers.{li}.mlp.1", 512)
        conv1d(f"gnn.layers.{li}.mlp.3", 256, 512)
    conv1d("final_proj", 256, 256)
    sd["bin_score"] = torch.tensor(1.25)
    return sd


def test_superglue_conversion_tree(tmp_path, rng, monkeypatch):
    from imcui_tpu.models.matchers import superglue as sg

    sd = make_superglue_sd(rng)
    path = _save(sd, tmp_path, "superglue_outdoor.pth")
    monkeypatch.setattr(sg, "download_checkpoint", lambda *a, **k: path)

    params, meta = sg.load_params({"weights": "outdoor", "gnn_layers": 4,
                                   "descriptor_dim": 256})
    assert meta["pretrained"]
    assert float(params["bin_score"]) == pytest.approx(1.25)
    np.testing.assert_allclose(
        np.asarray(params["final_proj"]["w"]),
        sd["final_proj.weight"].numpy()[..., 0].T, atol=1e-6,
    )
    assert len(params["gnn"]["layers"]) == 4
