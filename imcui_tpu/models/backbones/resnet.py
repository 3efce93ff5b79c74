"""ResNet-18/34 backbone (torchvision layout) for the retrieval extractors
(CosPlace/EigenPlaces — reference: imcui/hloc/extractors/cosplace.py:23,
eigenplaces.py:32, which pull ResNet trunks from torch.hub)."""

import jax
import jax.numpy as jnp

from ..layers import (batch_norm_inference, conv2d, init_conv,
                      max_pool3_s2, relu)


def init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_basic_block(key, cin, cout, stride):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": init_conv(k1, 3, 3, cin, cout, bias=False),
        "bn1": init_bn(cout),
        "conv2": init_conv(k2, 3, 3, cout, cout, bias=False),
        "bn2": init_bn(cout),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = {
            "0": init_conv(k3, 1, 1, cin, cout, bias=False),
            "1": init_bn(cout),
        }
    return p


def basic_block(p, x, stride):
    y = relu(batch_norm_inference(p["bn1"],
                                  conv2d(p["conv1"], x, stride=stride)))
    y = batch_norm_inference(p["bn2"], conv2d(p["conv2"], y))
    if "downsample" in p:
        x = batch_norm_inference(
            p["downsample"]["1"],
            conv2d(p["downsample"]["0"], x, stride=stride))
    return relu(x + y)


LAYERS_18 = [(64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)]


def init_resnet18(rng):
    keys = jax.random.split(rng, 12)
    ki = 0
    params = {
        "conv1": init_conv(keys[ki], 7, 7, 3, 64, bias=False),
        "bn1": init_bn(64),
    }
    ki += 1
    cin = 64
    for li, (cout, blocks, stride) in enumerate(LAYERS_18, start=1):
        layer = {}
        for bi in range(blocks):
            layer[str(bi)] = init_basic_block(
                keys[ki], cin, cout, stride if bi == 0 else 1)
            ki += 1
            cin = cout
        params[f"layer{li}"] = layer
    return params


def resnet18_apply(params, x):
    """x: (B, H, W, 3) → (B, H/32, W/32, 512) feature map."""
    x = relu(batch_norm_inference(
        params["bn1"], conv2d(params["conv1"], x, stride=2)))
    x = max_pool3_s2(x)  # torchvision stem pool: 3×3, stride 2, pad 1
    for li, (cout, blocks, stride) in enumerate(LAYERS_18, start=1):
        layer = params[f"layer{li}"]
        for bi in range(blocks):
            x = basic_block(layer[str(bi)], x,
                            stride if bi == 0 else 1)
    return x


def gem_pool(x, p=3.0, eps=1e-6):
    """Generalised-mean pooling over spatial dims. x: (B, H, W, C).
    ``p`` may be a learned scalar parameter (cosplace GeM ships one)."""
    p = jnp.asarray(p, jnp.float32).reshape(())
    x = jnp.clip(x, eps, None) ** p
    return x.mean((1, 2)) ** (1.0 / p)


# ---------------------------------------------------------------------------
# Bottleneck ResNet-50/101 (torchvision layout/naming — conv1/bn1/layer{i}.
# {j}.conv1..conv3/downsample — so pretrained checkpoints auto-convert).
# Used by the retrieval extractors whose upstream trunks are ResNet50/101
# (reference: imcui/hloc/extractors/{cosplace.py:24,eigenplaces.py:35,
# dir.py:27}).

BOTTLENECK_BLOCKS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


def init_bottleneck(key, cin, planes, stride):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cout = planes * 4
    p = {
        "conv1": init_conv(k1, 1, 1, cin, planes, bias=False),
        "bn1": init_bn(planes),
        "conv2": init_conv(k2, 3, 3, planes, planes, bias=False),
        "bn2": init_bn(planes),
        "conv3": init_conv(k3, 1, 1, planes, cout, bias=False),
        "bn3": init_bn(cout),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = {
            "0": init_conv(k4, 1, 1, cin, cout, bias=False),
            "1": init_bn(cout),
        }
    return p


def bottleneck_block(p, x, stride):
    y = relu(batch_norm_inference(p["bn1"], conv2d(p["conv1"], x)))
    y = relu(batch_norm_inference(p["bn2"],
                                  conv2d(p["conv2"], y, stride=stride)))
    y = batch_norm_inference(p["bn3"], conv2d(p["conv3"], y))
    if "downsample" in p:
        x = batch_norm_inference(
            p["downsample"]["1"],
            conv2d(p["downsample"]["0"], x, stride=stride))
    return relu(x + y)


def init_resnet(rng, depth="resnet50"):
    blocks = BOTTLENECK_BLOCKS[depth]
    keys = jax.random.split(rng, sum(blocks) + 1)
    ki = 0
    params = {
        "conv1": init_conv(keys[ki], 7, 7, 3, 64, bias=False),
        "bn1": init_bn(64),
    }
    ki += 1
    cin = 64
    for li, n in enumerate(blocks, start=1):
        planes = 64 * 2 ** (li - 1)
        layer = {}
        for bi in range(n):
            layer[str(bi)] = init_bottleneck(
                keys[ki], cin, planes, 2 if (bi == 0 and li > 1) else 1)
            ki += 1
            cin = planes * 4
        params[f"layer{li}"] = layer
    return params


def resnet_apply(params, x, depth="resnet50"):
    """x: (B, H, W, 3) → (B, H/32, W/32, 2048)."""
    blocks = BOTTLENECK_BLOCKS[depth]
    x = relu(batch_norm_inference(
        params["bn1"], conv2d(params["conv1"], x, stride=2)))
    x = max_pool3_s2(x)  # torchvision stem pool: 3×3, stride 2, pad 1
    for li, n in enumerate(blocks, start=1):
        layer = params[f"layer{li}"]
        for bi in range(n):
            x = bottleneck_block(layer[str(bi)], x,
                                 2 if (bi == 0 and li > 1) else 1)
    return x


def resnet_pyramid_apply(params, x, depth="resnet50"):
    """Feature pyramid for the DKM family (upstream dkm.models.dkm
    ``ResNet50``: {1: image, 2: stem relu, 4: layer1, 8: layer2,
    16: layer3, 32: layer4}). x: (H, W, 3) → dict of (h, w, c) maps."""
    blocks = BOTTLENECK_BLOCKS[depth]
    feats = {1: x}
    y = relu(batch_norm_inference(
        params["bn1"], conv2d(params["conv1"], x[None], stride=2)))
    feats[2] = y[0]
    y = max_pool3_s2(y)
    for li, n in enumerate(blocks, start=1):
        layer = params[f"layer{li}"]
        for bi in range(n):
            y = bottleneck_block(layer[str(bi)], y,
                                 2 if (bi == 0 and li > 1) else 1)
        feats[2 ** (li + 1)] = y[0]
    return feats
