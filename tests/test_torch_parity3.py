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


# ---------------------------------------------------------------------------
# D2-Net — dense VGG16 extractor (mgdtnt/d2-net lib/model_test.py): convs
# through conv4_3 with pool3 replaced by AvgPool2d(2, stride=1) and
# dilation-2 conv4 stage; soft detection = relu → exp(x/globalmax) with
# the 3×3 window sum padded by exp(0)=1, × channel-ratio-to-max, maxed
# over channels, map-normalised.
# ---------------------------------------------------------------------------


def torch_d2net_features(sd, img):
    import torch.nn.functional as F

    from imcui_tpu.models.extractors.d2net import VGG_CFG

    x = torch.from_numpy(img).permute(2, 0, 1)[None]
    for i, spec in enumerate(VGG_CFG):
        if spec == "maxpool":
            x = F.max_pool2d(x, 2, 2)
        elif spec == "avgpool1":
            x = F.avg_pool2d(x, 2, stride=1)  # no padding: H-1 × W-1
        else:
            dil = spec[2]
            x = F.conv2d(x, _t(sd, f"features.{i}.weight"),
                         _t(sd, f"features.{i}.bias"),
                         padding=dil, dilation=dil)
            x = F.relu(x)
    return x[0].permute(1, 2, 0).numpy()


def torch_d2_soft_detection(feats):
    import torch.nn.functional as F

    batch = torch.from_numpy(feats).permute(2, 0, 1)[None]
    b = batch.size(0)
    batch = F.relu(batch)
    max_per_sample = torch.max(batch.reshape(b, -1), dim=1)[0]
    exp = torch.exp(batch / max_per_sample.view(b, 1, 1, 1))
    sum_exp = 9 * F.avg_pool2d(
        F.pad(exp, [1] * 4, mode="constant", value=1.0), 3, stride=1)
    local_max_score = exp / sum_exp
    depth_wise_max = torch.max(batch, dim=1)[0]
    depth_wise_max_score = batch / depth_wise_max.unsqueeze(1)
    all_scores = local_max_score * depth_wise_max_score
    score = torch.max(all_scores, dim=1)[0]
    score = score / torch.sum(score.reshape(b, -1), dim=1).view(b, 1, 1)
    return score[0].numpy()


def test_d2net_backbone_parity():
    from imcui_tpu.models.extractors import d2net

    rng = np.random.default_rng(7)
    params = _randomize(d2net.init_params(jax.random.PRNGKey(0)), rng,
                        scale=0.05)
    sd = tree_to_state_dict(params)

    img = rng.uniform(size=(64, 96, 3)).astype(np.float32)
    want = torch_d2net_features(sd, img)  # (H/4-1, W/4-1, 512)
    got = np.asarray(d2net.backbone(params, jnp.asarray(img)[None])[0])
    hc, wc = want.shape[:2]
    # our avg-pool keeps the static shape by replicate-padding the last
    # row/col; that border difference propagates ≤6 px through the three
    # dilation-2 convs — the interior must match exactly
    np.testing.assert_allclose(got[:hc - 6, :wc - 6], want[:-6, :-6],
                               atol=1e-4, rtol=1e-3)


def test_d2net_soft_detection_parity():
    from imcui_tpu.models.extractors.d2net import d2_scores

    rng = np.random.default_rng(8)
    feats = rng.normal(size=(11, 13, 24)).astype(np.float32)
    want = torch_d2_soft_detection(feats)
    got = np.asarray(d2_scores(jnp.asarray(feats)[None])[0])
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-4)


# ---------------------------------------------------------------------------
# HardNet / SOSNet — published HardNet (DagnyT/hardnet model HardNet):
# 7 bias-free conv blocks with affine-free BatchNorm (strided ones pad
# symmetrically), final 8×8 VALID conv + BN, per-patch input_norm with
# torch's unbiased std + 1e-7 additive eps, L2 output normalisation.
# SOSNet shares the exact topology (different weights).
# ---------------------------------------------------------------------------


def torch_hardnet(blocks, patches):
    import torch.nn.functional as F

    from imcui_tpu.models.extractors.dog import HARDNET_SPEC

    x = torch.from_numpy(patches).permute(0, 3, 1, 2)
    # input_norm: flattened per-patch mean / unbiased std
    flat = x.reshape(x.size(0), -1)
    mp = flat.mean(dim=1).view(-1, 1, 1, 1)
    sp = flat.std(dim=1).view(-1, 1, 1, 1) + 1e-7
    x = (x - mp) / sp
    for i, ((cout, s, k), blk) in enumerate(zip(HARDNET_SPEC, blocks)):
        w = torch.from_numpy(
            np.asarray(blk["conv"]["w"]).transpose(3, 2, 0, 1))
        x = F.conv2d(x, w, None, stride=s, padding=(k // 2 if k == 3
                                                    else 0))
        x = F.batch_norm(
            x, torch.from_numpy(np.asarray(blk["bn"]["mean"])),
            torch.from_numpy(np.asarray(blk["bn"]["var"])), None, None,
            training=False)
        if i < len(HARDNET_SPEC) - 1:
            x = F.relu(x)
    x = x.reshape(x.size(0), -1)
    return F.normalize(x, p=2, dim=1).numpy()


def test_hardnet_forward_parity():
    from imcui_tpu.models.extractors import dog

    rng = np.random.default_rng(11)
    params = _randomize(dog.init_hardnet(jax.random.PRNGKey(0)), rng,
                        scale=0.1)
    patches = rng.uniform(size=(6, 32, 32, 1)).astype(np.float32)
    want = torch_hardnet(params["features"], patches)
    got = np.asarray(dog._describe(params, jnp.asarray(patches)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# NetVLAD — the reference's own torch port (imcui/hloc/extractors/
# netvlad.py:17-38, 65-68): VGG16 trunk sliced [:-2] (conv5_3 WITHOUT its
# ReLU, no pool5), input pre-normalisation, softmax soft-assignment,
# VLAD residual aggregation, per-cluster intra-norm over D, D-major
# flatten, global L2, linear whitening + final L2.
# ---------------------------------------------------------------------------


def torch_netvlad(params, image):
    import torch.nn.functional as F

    from imcui_tpu.models.extractors.netvlad import VGG16_CFG

    x = torch.from_numpy(image)  # (B, 3, H, W) already mean-shifted
    idx = 0
    for bi, block in enumerate(VGG16_CFG):
        for ci, _ in enumerate(block):
            p = params["backbone"][str(idx)]
            w = torch.from_numpy(
                np.asarray(p["w"]).transpose(3, 2, 0, 1).copy())
            x = F.conv2d(x, w, torch.from_numpy(np.asarray(p["b"])),
                         padding=1)
            if not (bi == len(VGG16_CFG) - 1 and ci == len(block) - 1):
                x = F.relu(x)
            idx += 2
        idx += 1
        if bi < len(VGG16_CFG) - 1:
            x = F.max_pool2d(x, 2, 2)

    b, c = x.size(0), x.size(1)
    descriptors = x.view(b, c, -1)
    descriptors = F.normalize(descriptors, dim=1)

    # NetVLADLayer.forward
    score_w = torch.from_numpy(
        np.asarray(params["netvlad"]["score_proj"]["w"])[0, 0].T.copy()
    ).unsqueeze(-1)  # (K, D, 1)
    centers = torch.from_numpy(np.asarray(params["netvlad"]["centers"]))
    scores = F.conv1d(descriptors, score_w)
    scores = F.softmax(scores, dim=1)
    diff = descriptors.unsqueeze(2) - centers.unsqueeze(0).unsqueeze(-1)
    desc = (scores.unsqueeze(1) * diff).sum(dim=-1)
    desc = F.normalize(desc, dim=1)
    desc = desc.reshape(b, -1)
    desc = F.normalize(desc, dim=1)

    w = torch.from_numpy(np.asarray(params["whiten"]["w"]).T.copy())
    bias = torch.from_numpy(np.asarray(params["whiten"]["b"]))
    desc = F.linear(desc, w, bias)
    return F.normalize(desc, dim=1).numpy()


def test_netvlad_forward_parity():
    from imcui_tpu.models.extractors import netvlad

    rng = np.random.default_rng(13)
    params = _randomize(netvlad.init_params(jax.random.PRNGKey(0)), rng,
                        scale=0.02)
    image = rng.uniform(size=(1, 3, 64, 64)).astype(np.float32)

    mean = np.asarray([123.68, 116.779, 103.939], np.float32) / 255.0
    shifted = (image - mean[None, :, None, None]) * 255.0
    want = torch_netvlad(params, shifted)
    got = np.asarray(netvlad.apply(params, jnp.asarray(image)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# SOLD² — published network (cvg/SOLD2 model_util.py, lcnn backbone
# config depth 4 / num_stacks 2 / num_blocks 1 / num_classes 5):
# stacked-hourglass with pre-activation Bottleneck2D (expansion 2),
# MultitaskHead score heads with inter-stack fc_/score_ wiring,
# stride-2 SuperpointDecoder junctions (65-way softmax + ×8 shuffle),
# PixelShuffleDecoder heatmap ([256, 64, 16] + 1×1 → 2ch softmax),
# SuperpointDescriptor 128-d semi-dense descriptors.
# ---------------------------------------------------------------------------


def torch_sold2(sd, img):
    import torch.nn.functional as F

    from imcui_tpu.models.matchers.sold2 import (DEPTH, HEAD_SIZES,
                                                 NUM_STACKS)

    def conv(prefix, x, stride=1):
        w = _t(sd, f"{prefix}.weight")
        return F.conv2d(x, w, _t(sd, f"{prefix}.bias"), stride=stride,
                        padding=w.shape[-1] // 2)

    def bn(prefix, x):
        return _torch_bn(sd, prefix, x)

    def bottleneck(prefix, x):
        y = conv(f"{prefix}.conv1", F.relu(bn(f"{prefix}.bn1", x)))
        y = conv(f"{prefix}.conv2", F.relu(bn(f"{prefix}.bn2", y)))
        y = conv(f"{prefix}.conv3", F.relu(bn(f"{prefix}.bn3", y)))
        if f"{prefix}.downsample.0.weight" in sd:
            x = conv(f"{prefix}.downsample.0", x)
        return y + x

    def hourglass(prefix, n, x):
        up1 = bottleneck(f"{prefix}.{n - 1}.0.0", x)
        low1 = bottleneck(f"{prefix}.{n - 1}.1.0", F.max_pool2d(x, 2, 2))
        low2 = (hourglass(prefix, n - 1, low1) if n > 1
                else bottleneck(f"{prefix}.0.3.0", low1))
        low3 = bottleneck(f"{prefix}.{n - 1}.2.0", low2)
        return up1 + F.interpolate(low3, scale_factor=2)  # nearest

    def head(prefix, x):
        outs = []
        for h in range(len(HEAD_SIZES)):
            y = F.relu(conv(f"{prefix}.heads.{h}.0", x))
            outs.append(conv(f"{prefix}.heads.{h}.2", y))
        return torch.cat(outs, 1)

    net = "backbone_net.net"
    x = torch.from_numpy(img)[None, None]
    x = F.relu(bn(f"{net}.bn1", conv(f"{net}.conv1", x, stride=2)))
    x = bottleneck(f"{net}.layer1.0", x)
    x = F.max_pool2d(x, 2, 2)
    x = bottleneck(f"{net}.layer2.0", x)
    x = bottleneck(f"{net}.layer3.0", x)
    y = x
    for s in range(NUM_STACKS):
        y = hourglass(f"{net}.hg.{s}.hg", DEPTH, x)
        y = bottleneck(f"{net}.res.{s}.0", y)
        y = F.relu(bn(f"{net}.fc.{s}.1", conv(f"{net}.fc.{s}.0", y)))
        score = head(f"{net}.score.{s}", y)
        if s < NUM_STACKS - 1:
            x = x + conv(f"{net}.fc_.{s}", y) \
                + conv(f"{net}.score_.{s}", score)

    semi = conv("junction_decoder.convPb",
                F.relu(conv("junction_decoder.convPa", y, stride=2)))
    prob = F.softmax(semi, dim=1)[:, :-1]
    junc = F.pixel_shuffle(prob, 8)[0, 0]

    hd = "heatmap_decoder.conv_block_lst"
    h = F.relu(bn(f"{hd}.0.1", conv(f"{hd}.0.0", y)))
    h = F.pixel_shuffle(h, 2)
    h = F.relu(bn(f"{hd}.1.1", conv(f"{hd}.1.0", h)))
    h = F.pixel_shuffle(h, 2)
    heat = F.softmax(conv(f"{hd}.2", h), dim=1)[0, 1]

    desc = conv("descriptor_decoder.convPb",
                F.relu(conv("descriptor_decoder.convPa", y)))
    desc = F.normalize(desc, p=2, dim=1)
    return junc.numpy(), heat.numpy(), desc[0].permute(1, 2, 0).numpy()


def test_sold2_network_parity():
    from imcui_tpu.models.matchers import sold2

    rng = np.random.default_rng(17)
    params = _randomize(sold2.init_params(jax.random.PRNGKey(0)), rng,
                        scale=0.05)
    sd = tree_to_state_dict(params)

    img = rng.uniform(size=(64, 64)).astype(np.float32)
    want_junc, want_heat, want_desc = torch_sold2(sd, img)
    junc, heat, desc = sold2.backbone(params,
                                      jnp.asarray(img)[None, ..., None])
    np.testing.assert_allclose(np.asarray(junc[0]), want_junc,
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(heat[0]), want_heat,
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(desc[0]), want_desc,
                               atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Deformable conv (ops/deform.py) — torchvision.ops.deform_conv2d
# semantics (offset channels (Δy, Δx) per tap row-major, zero-padded
# bilinear sampling, stride 1 / pad k//2), restated in torch via
# F.grid_sample per kernel tap (torchvision itself is not in the image;
# grid_sample with align_corners=True + zeros padding is the same
# sampling kernel deform_conv2d uses).
# ---------------------------------------------------------------------------


def torch_deform_conv2d(x, offsets, w, b):
    """x (N,C,H,W), offsets (N,2·kh·kw,H,W), w (Cout,Cin,kh,kw)."""
    import torch.nn.functional as F

    n, cin, h, ww = x.shape
    cout, _, kh, kw = w.shape
    norm = torch.tensor([max(ww - 1, 1), max(h - 1, 1)],
                        dtype=torch.float32)
    ys = torch.arange(h, dtype=torch.float32).view(1, h, 1)
    xs = torch.arange(ww, dtype=torch.float32).view(1, 1, ww)
    out = torch.zeros(n, cout, h, ww)
    for i in range(kh):
        for j in range(kw):
            k = i * kw + j
            py = ys + (i - kh // 2) + offsets[:, 2 * k]
            px = xs + (j - kw // 2) + offsets[:, 2 * k + 1]
            grid = torch.stack([px, py], -1) / norm * 2 - 1  # (N,H,W,2)
            samp = F.grid_sample(x, grid, mode="bilinear",
                                 padding_mode="zeros",
                                 align_corners=True)
            out = out + torch.einsum("nchw,dc->ndhw", samp, w[:, :, i, j])
    return out + b.view(1, -1, 1, 1)


def test_deform_conv2d_parity():
    from imcui_tpu.ops.deform import deform_conv2d

    rng = np.random.default_rng(19)
    x = rng.normal(size=(2, 9, 11, 6)).astype(np.float32)
    offsets = rng.normal(size=(2, 9, 11, 18), scale=1.5).astype(np.float32)
    w = rng.normal(size=(3, 3, 6, 4), scale=0.2).astype(np.float32)
    b = rng.normal(size=(4,)).astype(np.float32)

    want = torch_deform_conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(offsets).permute(0, 3, 1, 2),
        torch.from_numpy(w).permute(3, 2, 0, 1).contiguous(),
        torch.from_numpy(b),
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets),
                                   jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# ALIKED — published design (Shiaoming/ALIKED): SELU gate, AvgPool
# 2/4/4 pyramid (strides 1, 1/2, 1/8, 1/32), BN ConvBlock/ResBlocks
# with deformable convs in blocks 3-4, align-corners aggregation,
# 4-conv bias-free score head, dense L2 feature normalisation, SDDH
# with conv-based offset prediction.
# ---------------------------------------------------------------------------


def torch_aliked_backbone(sd, img):
    import torch.nn.functional as F

    x = torch.from_numpy(img).permute(2, 0, 1)[None]
    gate = F.selu

    def conv(prefix, x, bias=True, stride=1):
        w = _t(sd, f"{prefix}.weight")
        b = _t(sd, f"{prefix}.bias") if bias else None
        return F.conv2d(x, w, b, stride=stride, padding=w.shape[-1] // 2)

    def dcn(prefix, x):
        h, w_ = x.shape[-2:]
        max_offset = max(h, w_) / 4.0
        off = conv(f"{prefix}.offset_conv", x).clamp(-max_offset,
                                                     max_offset)
        w = _t(sd, f"{prefix}.regular_conv.weight")
        return torch_deform_conv2d(x, off, w,
                                   torch.zeros(w.shape[0]))

    def conv_block(prefix, x):
        x = gate(_torch_bn(sd, f"{prefix}.bn1",
                           conv(f"{prefix}.conv1", x, bias=False)))
        return gate(_torch_bn(sd, f"{prefix}.bn2",
                              conv(f"{prefix}.conv2", x, bias=False)))

    def res_block(prefix, x, deform=False):
        op = dcn if deform else (lambda p, v: conv(p, v, bias=False))
        y = gate(_torch_bn(sd, f"{prefix}.bn1",
                           op(f"{prefix}.conv1", x)))
        y = _torch_bn(sd, f"{prefix}.bn2", op(f"{prefix}.conv2", y))
        return gate(y + conv(f"{prefix}.downsample", x))

    x1 = conv_block("block1", x)
    x2 = res_block("block2", F.avg_pool2d(x1, 2, 2))
    x3 = res_block("block3", F.avg_pool2d(x2, 4, 4), deform=True)
    x4 = res_block("block4", F.avg_pool2d(x3, 4, 4), deform=True)

    hw = x.shape[-2:]

    def agg(prefix, feat):
        y = gate(conv(prefix, feat, bias=False))
        if y.shape[-2:] != hw:
            y = F.interpolate(y, size=hw, mode="bilinear",
                              align_corners=True)
        return y

    feats = torch.cat([agg("conv1", x1), agg("conv2", x2),
                       agg("conv3", x3), agg("conv4", x4)], 1)

    s = gate(conv("score_head.0", feats, bias=False))
    s = gate(conv("score_head.2", s, bias=False))
    s = gate(conv("score_head.4", s, bias=False))
    score = torch.sigmoid(conv("score_head.6", s, bias=False))

    fmap = F.normalize(feats, p=2, dim=1)
    return fmap[0].permute(1, 2, 0).numpy(), score[0, 0].numpy()


def torch_aliked_sddh(sd, fmap, kpts, K, M):
    import torch.nn.functional as F

    h, w, dim = fmap.shape
    fm = torch.from_numpy(fmap).permute(2, 0, 1)[None]
    max_offset = max(h, w) / 4.0
    r = K // 2
    descs = []
    for kx, ky in kpts:
        ix = np.clip(np.arange(int(kx) - r, int(kx) + r + 1), 0, w - 1)
        iy = np.clip(np.arange(int(ky) - r, int(ky) + r + 1), 0, h - 1)
        patch = fm[0][:, torch.from_numpy(iy)][:, :, torch.from_numpy(ix)]
        o = F.conv2d(patch[None], _t(sd, "desc_head.offset_conv.0.weight"),
                     _t(sd, "desc_head.offset_conv.0.bias"))
        o = F.selu(o)
        o = F.conv2d(o, _t(sd, "desc_head.offset_conv.2.weight"),
                     _t(sd, "desc_head.offset_conv.2.bias"))
        off = o.clamp(-max_offset, max_offset).reshape(M, 2)
        pos = torch.tensor([float(kx), float(ky)]) + off  # (M, 2) xy
        grid = pos / torch.tensor([w - 1.0, h - 1.0]) * 2 - 1
        samp = F.grid_sample(fm, grid[None, None], mode="bilinear",
                             align_corners=True)[0, :, 0]  # (C, M)
        # upstream: sf_conv on (N, C, n_pos, 1), squeeze, C-major flatten
        samp = F.selu(F.conv2d(samp[None, :, :, None],
                               _t(sd, "desc_head.sf_conv.weight")))
        samp = samp.squeeze(-1).reshape(1, dim * M)
        d = F.conv2d(samp[..., None, None],
                     _t(sd, "desc_head.convM.weight"))
        descs.append(F.normalize(d.reshape(1, -1), p=2, dim=1)[0])
    return torch.stack(descs).numpy()


def test_aliked_published_parity():
    from imcui_tpu.models.extractors import aliked

    rng = np.random.default_rng(21)
    sizes = aliked.SIZES["aliked-t16"]
    params = _randomize(
        aliked.init_params(jax.random.PRNGKey(0), **sizes), rng,
        scale=0.1)
    sd = tree_to_state_dict(params)

    img = rng.uniform(size=(64, 96, 3)).astype(np.float32)
    want_fmap, want_score = torch_aliked_backbone(sd, img)
    got_fmap, got_score = aliked.backbone(params, jnp.asarray(img)[None])
    np.testing.assert_allclose(np.asarray(got_score[0]), want_score,
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_fmap[0]), want_fmap,
                               atol=2e-4, rtol=1e-3)

    kpts = np.asarray([[10.0, 12.0], [30.0, 7.0], [20.0, 20.0],
                       [63.0, 50.0]], np.float32)
    want_desc = torch_aliked_sddh(sd, want_fmap, kpts, sizes["K"],
                                  sizes["M"])
    got_desc = np.asarray(aliked.sddh(params, got_fmap[0],
                                      jnp.asarray(kpts), sizes["K"],
                                      sizes["M"]))
    np.testing.assert_allclose(got_desc, want_desc, atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# COTR — published DETR-derived model (ubc-vision/COTR cotr_model.py):
# ResNet50-layer3 trunk (restated via the fixture in
# test_torch_parity2.test_resnet50_stem_and_bottleneck_parity), NeRF
# 'lin_sine' positional encoding, post-norm 6+6 transformer with fused
# nn.MultiheadAttention layouts, 3-layer corr_embed MLP. This fixture
# pins the transformer + encoding path end-to-end on a small token set.
# ---------------------------------------------------------------------------


def torch_cotr_transformer(sd, memory, pos, queries):
    import math

    import torch.nn.functional as F

    from imcui_tpu.models.matchers.cotr import (N_DEC, N_ENC, NERF_DEPTH,
                                                NHEAD)

    def nerf(xy):
        outs = [torch.sin(k * math.pi * xy) for k in
                range(1, NERF_DEPTH + 1)]
        outs += [torch.cos(k * math.pi * xy) for k in
                 range(1, NERF_DEPTH + 1)]
        return torch.cat(outs, -1)

    def mha(prefix, q, k, v):
        w = _t(sd, f"{prefix}.in_proj.weight")  # (3d, d) torch layout
        b = _t(sd, f"{prefix}.in_proj.bias")
        return F.multi_head_attention_forward(
            q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1),
            w.shape[1], NHEAD, w, b, None, None, False, 0.0,
            _t(sd, f"{prefix}.out_proj.weight"),
            _t(sd, f"{prefix}.out_proj.bias"),
            training=False, need_weights=False)[0].squeeze(1)

    def ln(prefix, x):
        return F.layer_norm(x, x.shape[-1:], _t(sd, f"{prefix}.weight"),
                            _t(sd, f"{prefix}.bias"))

    def lin(prefix, x):
        return F.linear(x, _t(sd, f"{prefix}.weight"),
                        _t(sd, f"{prefix}.bias"))

    src = memory
    for i in range(N_ENC):
        p = f"transformer.encoder.layers.{i}"
        q = src + pos
        src = ln(f"{p}.norm1", src + mha(f"{p}.self_attn", q, q, src))
        ffn = lin(f"{p}.linear2", F.relu(lin(f"{p}.linear1", src)))
        src = ln(f"{p}.norm2", src + ffn)

    query_pos = nerf(queries)
    tgt = torch.zeros_like(query_pos)
    for i in range(N_DEC):
        p = f"transformer.decoder.layers.{i}"
        q = tgt + query_pos
        tgt = ln(f"{p}.norm1", tgt + mha(f"{p}.self_attn", q, q, tgt))
        tgt = ln(f"{p}.norm2", tgt + mha(
            f"{p}.multihead_attn", tgt + query_pos, src + pos, src))
        ffn = lin(f"{p}.linear2", F.relu(lin(f"{p}.linear1", tgt)))
        tgt = ln(f"{p}.norm3", tgt + ffn)
    tgt = ln("transformer.decoder.norm", tgt)

    y = F.relu(lin("corr_embed.layers.0", tgt))
    y = F.relu(lin("corr_embed.layers.1", y))
    return lin("corr_embed.layers.2", y).numpy()


def test_cotr_transformer_parity():
    from imcui_tpu.models.matchers import cotr

    rng = np.random.default_rng(23)
    params = _randomize(cotr.init_params(jax.random.PRNGKey(0)), rng,
                        scale=0.05)
    sd = tree_to_state_dict(params)

    n_tok, n_q = 24, 7
    memory = rng.normal(size=(n_tok, cotr.D_MODEL)).astype(np.float32)
    grid = rng.uniform(size=(n_tok, 2)).astype(np.float32)
    queries = rng.uniform(size=(n_q, 2)).astype(np.float32)

    pos_j = cotr.nerf_encode(jnp.asarray(grid))
    enc = params["transformer"]["encoder"]
    mem_j = jnp.asarray(memory)
    for i in range(cotr.N_ENC):
        mem_j = cotr.enc_layer(enc["layers"][str(i)], mem_j, pos_j)
    got = np.asarray(cotr.decode(params, mem_j, pos_j,
                                 jnp.asarray(queries)))

    # torch runs encoder+decoder end-to-end from the same inputs
    want = torch_cotr_transformer(
        sd, torch.from_numpy(memory),
        torch.from_numpy(np.asarray(cotr.nerf_encode(jnp.asarray(grid)))),
        torch.from_numpy(queries))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def test_cotr_nerf_encoding_order():
    """The upstream cat order is [sin(kπ(x,y))]_k ++ [cos(kπ(x,y))]_k —
    the in_proj weights consume this ordering, so it is
    checkpoint-load-bearing."""
    import math

    from imcui_tpu.models.matchers.cotr import NERF_DEPTH, nerf_encode

    xy = np.asarray([[0.2, 0.7]], np.float32)
    got = np.asarray(nerf_encode(jnp.asarray(xy)))[0]
    want = []
    for k in range(1, NERF_DEPTH + 1):
        want += [math.sin(k * math.pi * 0.2), math.sin(k * math.pi * 0.7)]
    for k in range(1, NERF_DEPTH + 1):
        want += [math.cos(k * math.pi * 0.2), math.cos(k * math.pi * 0.7)]
    # f32 sin/cos at k·π arguments up to 64π: ~1e-5 ULP noise
    np.testing.assert_allclose(got, np.asarray(want, np.float32),
                               atol=2e-5)


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
