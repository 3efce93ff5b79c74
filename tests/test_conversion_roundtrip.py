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


def _dedode_builder(mod, conf, init):
    return {
        "dedode_detector_L.pth": W.tree_to_state_dict(init["detector"]),
        "dedode_descriptor_B.pth": W.tree_to_state_dict(init["descriptor"]),
    }


# module suffix, conf, builder (None = single-file default)
CASES = [
    ("extractors.alike", {"model_name": "alike-n"}, None),
    ("extractors.aliked", {"model_name": "aliked-n16"}, None),
    ("extractors.darkfeat", {}, None),
    ("extractors.dedode", {}, _dedode_builder),
    ("extractors.fire", {}, None),
    ("extractors.lanet", {}, None),
    ("extractors.liftfeat", {}, None),
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


@pytest.mark.parametrize(
    "suffix,conf,builder", CASES, ids=[c[0] for c in CASES])
def test_conversion_roundtrip(suffix, conf, builder, tmp_path, monkeypatch):
    mod = importlib.import_module(f"imcui_tpu.models.{suffix}")
    # offline pass → deterministic random init (the conversion target)
    monkeypatch.setattr(W, "download_checkpoint", lambda *a, **k: None)
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

    monkeypatch.setattr(W, "download_checkpoint", fake_download)
    params, meta = mod.load_params(dict(conf))
    assert meta["pretrained"] is True, f"{suffix}: checkpoint not consumed"
    _trees_equal(params, init)
