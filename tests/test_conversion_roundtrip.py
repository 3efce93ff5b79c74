"""Per-model weight-conversion dry runs (VERDICT r1 item 1).

For every zoo model with a known checkpoint filename we synthesize a torch
checkpoint carrying the upstream tensor names/shapes the converter expects
(our param trees mirror the published module naming; the synthetic
state_dict is the tree pushed through the inverse transform), save it,
intercept the hub download, and assert that ``load_params``:

- reports ``pretrained=True``,
- reproduces the original tree exactly (transposes round-trip),
- never silently falls back to random init when a checkpoint is present.

Reference bar: imcui/hloc/utils/base_model.py:37-43 (every zoo entry loads
real weights). Models with genuinely custom converters (superpoint,
lightglue, superglue, loftr) keep their dedicated tests in
test_weight_conversion.py / test_loftr.py.
"""

import importlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from imcui_tpu.utils import weights as W  # noqa: E402


def _default_builder(mod, conf, init):
    """filename → state_dict map via the inverse transform on the tree."""
    return {None: W.tree_to_state_dict(init)}


def _netvlad_builder(mod, conf, init):
    """Reference module names; score_proj as a torch Conv1d tensor."""
    sd = {}
    for idx, node in init["backbone"].items():
        for k, v in W.tree_to_state_dict(node).items():
            sd[f"backbone.{idx}.{k}"] = v
    w = np.asarray(init["netvlad"]["score_proj"]["w"])  # (1,1,D,K)
    sd["netvlad.score_proj.weight"] = np.transpose(w[0, 0])[:, :, None]
    sd["netvlad.centers"] = np.asarray(init["netvlad"]["centers"])
    for k, v in W.tree_to_state_dict(init["whiten"]).items():
        sd[f"whiten.{k}"] = v
    return {None: sd}


def _xfeat_builder(mod, conf, init):
    """Emit the upstream XFeatModel names (plain head convs live at the
    tail of their Sequentials) so the rename rules are exercised."""
    sd = W.tree_to_state_dict(init)
    ren = {"skip1.": "skip1.1.", "fusion_out.": "block_fusion.2.",
           "heatmap_out.": "heatmap_head.2.",
           "keypoint_out.": "keypoint_head.3."}
    out = {}
    for k, v in sd.items():
        for ours, theirs in ren.items():
            if k.startswith(ours):
                k = theirs + k[len(ours):]
                break
        out[k] = v
    return {None: out}


def _d2net_builder(mod, conf, init):
    """d2_tf.pth names: dense_feature_extraction.model.<seq idx>.*"""
    inv = {o: u for u, o in mod._UPSTREAM_IDX.items()}
    sd = {}
    for i, node in enumerate(init["features"]):
        if node is None:
            continue
        for k, v in W.tree_to_state_dict(node).items():
            sd[f"dense_feature_extraction.model.{inv[i]}.{k}"] = v
    return {None: sd}


def _disk_builder(mod, conf, init):
    """Arbitrary upstream names (conversion is order-based): convs +
    per-channel PReLU gains interleaved per stage, in traversal order."""
    sd = {}
    i = 0
    for stage in init["down"] + init["up"]:
        sd[f"unet.m{i}.conv.weight"] = np.transpose(
            np.asarray(stage["conv"]["w"]), (3, 2, 0, 1))
        sd[f"unet.m{i}.conv.bias"] = np.asarray(stage["conv"]["b"])
        if stage["gate"] is not None:
            sd[f"unet.m{i}.gate.weight"] = np.asarray(
                stage["gate"]["alpha"])
        i += 1
    return {None: sd}


def _dedode_builder(mod, conf, init):
    return {
        "dedode_detector_L.pth": W.tree_to_state_dict(init["detector"]),
        "dedode_descriptor_B.pth": W.tree_to_state_dict(init["descriptor"]),
    }


# module suffix, conf, builder (None = single-file default)
CASES = [
    ("extractors.alike", {"model_name": "alike-n"}, None),
    ("extractors.aliked", {"model_name": "aliked-n16"}, None),
    ("extractors.d2net", {}, _d2net_builder),
    ("extractors.darkfeat", {}, None),
    ("extractors.dedode", {}, _dedode_builder),
    ("extractors.disk", {}, _disk_builder),
    ("extractors.fire", {}, None),
    ("extractors.lanet", {}, None),
    ("extractors.liftfeat", {}, None),
    ("extractors.netvlad", {}, _netvlad_builder),
    ("extractors.r2d2", {}, None),
    ("extractors.raco", {}, None),
    ("extractors.rdd", {}, None),
    ("extractors.rekd", {}, None),
    ("extractors.ripe", {}, None),
    ("extractors.sfd2", {}, None),
    ("extractors.xfeat", {}, _xfeat_builder),
    ("matchers.aspanformer", {}, None),
    ("matchers.cotr", {}, None),
    ("matchers.duster",
     {"enc_dim": 64, "enc_depth": 2, "enc_heads": 4, "dec_dim": 64,
      "dec_depth": 2, "dec_heads": 4, "patch": 16,
      "pos_embed": "RoPE100", "head_type": "dpt"}, None),
    ("matchers.mast3r",
     {"enc_dim": 64, "enc_depth": 2, "enc_heads": 4, "dec_dim": 64,
      "dec_depth": 2, "dec_heads": 4, "patch": 16,
      "pos_embed": "RoPE100", "head_type": "dpt", "desc_dim": 24}, None),
    ("matchers.eloftr", {}, None),
    ("matchers.imp", {}, None),
    ("matchers.jamma", {}, None),
    ("matchers.lisrd", {}, None),
    ("matchers.loma", {}, None),
    ("matchers.matchformer", {}, None),
    ("matchers.mickey", {}, None),
    ("matchers.se2loftr", {}, None),
    ("matchers.sgmnet",
     {"descriptor_dim": 128, "net_channels": 128, "layer_num": 4}, None),
    ("matchers.sold2", {}, None),
    ("matchers.sphereglue", {}, None),
    ("matchers.topicfm", {}, None),
    ("matchers.xoftr", {}, None),
]


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_cosplace_conversion(tmp_path, monkeypatch):
    """gmberton/cosplace naming: torchvision-Sequential trunk indices +
    aggregation.(1.p|3.*) head (shared by EigenPlaces)."""
    from imcui_tpu.models.extractors import cosplace as cp

    conf = {"backbone": "ResNet18", "fc_output_dim": 512}
    init = cp.init_params(jax.random.PRNGKey(0), "ResNet18", 512)
    prefix_map = {"conv1.": "backbone.0.", "bn1.": "backbone.1.",
                  "layer1.": "backbone.4.", "layer2.": "backbone.5.",
                  "layer3.": "backbone.6.", "layer4.": "backbone.7."}
    sd = {}
    for k, v in W.tree_to_state_dict(init["backbone"]).items():
        for ours, theirs in prefix_map.items():
            if k.startswith(ours):
                k = theirs + k[len(ours):]
                break
        sd[k] = torch.tensor(np.asarray(v))
    sd["aggregation.1.p"] = torch.tensor(np.asarray(init["gem"]["p"]))
    for k, v in W.tree_to_state_dict(init["fc"]).items():
        sd[f"aggregation.3.{k}"] = torch.tensor(np.asarray(v))
    path = tmp_path / "cosplace_ResNet18_512.pth"
    torch.save(sd, path)
    monkeypatch.setattr(W, "download_checkpoint", lambda *a, **k: path)
    model = cp.CosPlace(conf)
    assert model.meta["pretrained"] is True
    _trees_equal(model.params, init)


def test_dog_hardnet_conversion(tmp_path, monkeypatch):
    """Class-based loader: 7 bias-free convs + affine-free BN stats in
    module order (upstream HardNet state_dict layout)."""
    from imcui_tpu.models.extractors import dog as dog_mod

    init = dog_mod.init_hardnet(jax.random.PRNGKey(1))
    sd = {}
    for i, blk in enumerate(init["features"]):
        j = i * 3
        sd[f"features.{j}.weight"] = torch.tensor(
            np.transpose(np.asarray(blk["conv"]["w"]), (3, 2, 0, 1)))
        mean = np.random.default_rng(i).normal(size=(
            blk["bn"]["mean"].shape[0],)).astype(np.float32)
        sd[f"features.{j + 1}.running_mean"] = torch.tensor(mean)
        sd[f"features.{j + 1}.running_var"] = torch.tensor(mean ** 2 + 1)
        sd[f"features.{j + 1}.num_batches_tracked"] = torch.zeros(
            (), dtype=torch.long)
    path = tmp_path / "hardnet_liberty.pth"
    torch.save(sd, path)
    monkeypatch.setattr(dog_mod, "download_checkpoint",
                        lambda *a, **k: path)
    model = dog_mod.DoG({"descriptor": "hardnet"})
    assert model.meta["pretrained"] is True
    got = np.asarray(model.net_params["features"][3]["bn"]["mean"])
    np.testing.assert_allclose(
        got, np.asarray(sd["features.10.running_mean"]))


@pytest.mark.parametrize(
    "suffix,conf,builder", CASES, ids=[c[0] for c in CASES])
def test_conversion_roundtrip(suffix, conf, builder, tmp_path, monkeypatch):
    mod = importlib.import_module(f"imcui_tpu.models.{suffix}")
    # the offline pass below must see RANDOM init, not the committed
    # locally-trained fallbacks (utils.weights.local_trained_npz)
    monkeypatch.setenv("IMCUI_WEIGHTS_DIR", str(tmp_path / "no_weights"))

    def patch_download(fn):
        monkeypatch.setattr(W, "download_checkpoint", fn)
        if hasattr(mod, "download_checkpoint"):  # module-local import
            monkeypatch.setattr(mod, "download_checkpoint", fn)

    # offline pass → deterministic random init (the conversion target)
    patch_download(lambda *a, **k: None)
    init, meta = mod.load_params(dict(conf))
    assert meta["pretrained"] is False

    sds = (builder or _default_builder)(mod, conf, init)
    paths = {}
    for i, (fname, sd) in enumerate(sds.items()):
        path = tmp_path / f"ckpt_{i}.pth"
        # NB: np.ascontiguousarray would promote 0-d scalars to 1-d
        torch.save({k: torch.tensor(np.asarray(v))
                    for k, v in sd.items()}, path)
        paths[fname] = path

    def fake_download(filename, *a, **k):
        if None in paths:  # single-file case: serve it for any request
            return paths[None]
        return paths.get(filename)

    patch_download(fake_download)
    params, meta = mod.load_params(dict(conf))
    assert meta["pretrained"] is True, f"{suffix}: checkpoint not consumed"
    _trees_equal(params, init)


def test_dkm_conversion_roundtrip():
    """DKMv3 (published ResNet50+GP+DFN architecture): synthetic
    upstream-named state_dict (encoder.net.* / decoder.*) through the
    real load path reproduces the tree (VERDICT r2 #2)."""
    import jax
    import numpy as np

    from imcui_tpu.models.matchers import dkm
    from imcui_tpu.utils.weights import (assert_tree_matches,
                                         convert_state_dict_auto,
                                         normalize_state_dict,
                                         prune_to_tree,
                                         tree_to_state_dict)

    params = dkm.init_params(jax.random.PRNGKey(0))
    sd = tree_to_state_dict(params)
    up = {}
    for k, v in sd.items():
        if k.startswith("encoder."):
            up["encoder.net." + k[len("encoder."):]] = v
        else:
            up["decoder." + k] = v
    up["superpoint.conv1a.weight"] = np.zeros((4, 1, 3, 3), np.float32)
    up["encoder.net.bn1.num_batches_tracked"] = np.asarray(3)
    up = normalize_state_dict(
        up, rename=((r"^encoder\.net\.", "encoder."), (r"^decoder\.", "")),
        drop=(r"^superpoint\.", r"num_batches_tracked"))
    tree = prune_to_tree(convert_state_dict_auto(up), params)
    assert_tree_matches(tree, params, "dkm")
    a = jax.tree_util.tree_leaves(tree)
    b = jax.tree_util.tree_leaves(params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))
