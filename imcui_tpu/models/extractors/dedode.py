"""DeDoDe — "detect, don't describe; describe, don't detect" — native JAX.

Published architecture (reference wrapper imcui/hloc/extractors/dedode.py:51-52
builds ``dedode_detector_L`` + ``dedode_descriptor_B`` from the DeDoDe
submodule; 3DV 2024): two fully independent networks. Each is a
torchvision VGG19-BN encoder (``vgg19_bn().features[:40]`` held as
``encoder.layers``; activations are collected right before each MaxPool →
strides 1/2/4/8 with 64/128/256/512 channels) feeding a coarse-to-fine
decoder of per-scale ConvRefiners (DKM lineage: Sequential(5×5 conv, BN,
ReLU, 1×1 conv) blocks — torch indices 0/1/3 — with a RESIDUAL hidden
stack and a 1×1 out head). At each scale the refiner consumes
cat(vgg_feature, upsampled context) and emits num_prototypes P + context
channels; the P-channel "logits" accumulate across scales through
bicubic upsampling, the context through bilinear (both torch
align_corners=False semantics — ops/resize.torch_interpolate):

    detector L:   P=1,   hidden 512/256/128/64, context 256/128/64, 8 blocks
    descriptor B: P=256, hidden 512/256/64/32,  context 256/128/32, 5 blocks

Detection is DeDoDe's distribution sampling (upstream
``DeDoDeDetector.detect`` → ``sample_keypoints(use_nms=False,
sample_topk=True, increase_coverage=True)``): softmax over all pixels,
then the scoremap is divided by the square root of its own local 51-tap
Gaussian density (coverage re-weighting) before a plain top-k — no NMS.
Descriptions are bilinear grid samples of the descriptor grid at the
keypoints (torch align_corners=False, ops/sampling.grid_sample),
L2-normalised as the upstream DualSoftmaxMatcher(normalize=True)
consumes them. Inputs are ImageNet-normalised (the reference wrapper's
``self.normalizer``).

TPU-first: both nets are single batched NHWC conv programs; the residual
hidden stacks run as ``lax.scan`` over stacked block params (one body in
the HLO); cross-scale resizes are static-shape gather+weight chains;
top-k is the shared masked fixed-k selection.

Hidden/context widths follow the published builders as reconstructed
from the upstream sources (the DeDoDe submodule is empty in this
snapshot); conversion is shape-checked end-to-end (assert_tree_matches),
so any mismatch raises loudly at load time instead of mis-loading —
same stance as RoMa's refiner table (STATUS.md).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ...ops import nms as nms_ops
from ...ops.resize import torch_interpolate
from ...ops.sampling import grid_sample
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import batch_norm_inference, conv2d, init_conv, max_pool, relu

DESC_DIM = 256

# torchvision vgg19_bn().features[:40]: (kind, torch index, cin, cout);
# ReLUs (parameter-free) omitted, pools mark the stride transitions at
# which the upstream VGG19 wrapper harvests the running activation.
VGG19_BN = [
    ("conv", 0, 3, 64), ("conv", 3, 64, 64), ("pool", 6, None, None),
    ("conv", 7, 64, 128), ("conv", 10, 128, 128), ("pool", 13, None, None),
    ("conv", 14, 128, 256), ("conv", 17, 256, 256),
    ("conv", 20, 256, 256), ("conv", 23, 256, 256),
    ("pool", 26, None, None),
    ("conv", 27, 256, 512), ("conv", 30, 512, 512),
    ("conv", 33, 512, 512), ("conv", 36, 512, 512),
    ("pool", 39, None, None),
]

# scale: (refiner in_dim, hidden_dim, context channels out). P (the
# prototype/description channels, accumulated across scales) is 1 for
# the detector and DESC_DIM for the descriptor; out_conv emits P + ctx.
DET_REFINERS = {"8": (512, 512, 256), "4": (512, 256, 128),
                "2": (256, 128, 64), "1": (128, 64, 0)}
DET_BLOCKS = 8
DESC_REFINERS = {"8": (512, 512, 256), "4": (512, 256, 128),
                 "2": (256, 64, 32), "1": (96, 32, 0)}
DESC_BLOCKS = 5

SCALES = ("8", "4", "2", "1")

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _init_bn(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,)),
            "mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))}


def _init_block(key, cin, cout):
    """Upstream ConvRefiner.create_block: Sequential(5×5 conv, BN, ReLU,
    1×1 conv) — torch child indices 0/1/(2)/3. DeDoDe's refiners narrow
    (in ≠ hidden), so the 5×5 is dense, not depthwise."""
    k1, k2 = jax.random.split(key)
    return {"0": init_conv(k1, 5, 5, cin, cout),
            "1": _init_bn(cout),
            "3": init_conv(k2, 1, 1, cout, cout)}


def _block_apply(blk, x):
    y = relu(batch_norm_inference(blk["1"], conv2d(blk["0"], x)))
    return conv2d(blk["3"], y)


def init_vgg19(rng):
    """Param tree mirroring ``encoder.layers.{torch index}``."""
    keys = iter(jax.random.split(rng, 16))
    layers = {}
    for kind, idx, cin, cout in VGG19_BN:
        if kind != "conv":
            continue
        layers[str(idx)] = init_conv(next(keys), 3, 3, cin, cout)
        layers[str(idx + 1)] = _init_bn(cout)
    return {"layers": layers}


def vgg19_apply(enc, x):
    """x: (1, H, W, 3) → {8: .., 4: .., 2: .., 1: ..} stride-keyed feats
    (collected right before each pool, like the upstream VGG19 loop)."""
    feats = {}
    stride = 1
    for kind, idx, _, _ in VGG19_BN:
        if kind == "pool":
            feats[stride] = x
            if stride < 8:           # the post-collection pool at
                x = max_pool(x)      # stride 8 feeds nothing
            stride *= 2
        else:
            p = enc["layers"]
            x = relu(batch_norm_inference(p[str(idx + 1)],
                                          conv2d(p[str(idx)], x)))
    return feats


def init_decoder(rng, refiners, blocks, num_prototypes):
    keys = jax.random.split(rng, len(refiners))
    layers = {}
    for key, (scale, (cin, hidden, ctx)) in zip(keys, refiners.items()):
        ks = iter(jax.random.split(key, blocks + 2))
        layers[scale] = {
            "block1": _init_block(next(ks), cin, hidden),
            "hidden_blocks": [_init_block(next(ks), hidden, hidden)
                              for _ in range(blocks)],
            "out_conv": init_conv(next(ks), 1, 1, hidden,
                                  num_prototypes + ctx),
        }
    return {"layers": layers}


def _refiner_apply(p, x):
    x = _block_apply(p["block1"], x)
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *p["hidden_blocks"])

    def body(h, blk):                       # residual hidden stack
        return h + _block_apply(blk, h), None

    x, _ = lax.scan(body, x, stacked)
    return conv2d(p["out_conv"], x)


def decoder_apply(dec, feats, num_prototypes):
    """Coarse-to-fine prototype accumulation (upstream
    DeDoDeDetector.forward_impl): at each scale
    ``delta, ctx = refiner(cat(feat, ctx))``; the running P-channel map
    is bicubic-upsampled between scales, the context bilinear."""
    acc = None
    ctx = None
    for scale in SCALES:
        f = feats[int(scale)]
        x = f if ctx is None else jnp.concatenate([f, ctx], -1)
        out = _refiner_apply(dec["layers"][scale], x)
        delta, ctx = out[..., :num_prototypes], out[..., num_prototypes:]
        acc = delta if acc is None else acc + delta
        if scale != "1":
            nh, nw = feats[int(scale) // 2].shape[1:3]
            acc = torch_interpolate(acc, (nh, nw), "bicubic")
            ctx = torch_interpolate(ctx, (nh, nw), "bilinear")
    return acc


def init_params(rng):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "detector": {
            "encoder": init_vgg19(k1),
            "decoder": init_decoder(k2, DET_REFINERS, DET_BLOCKS, 1),
        },
        "descriptor": {
            "encoder": init_vgg19(k3),
            "decoder": init_decoder(k4, DESC_REFINERS, DESC_BLOCKS,
                                    DESC_DIM),
        },
    }


def load_params(conf):
    """DeDoDe ships detector and descriptor as separate checkpoints
    (reference conf: imcui/hloc/extractors/dedode.py:23-24) — convert
    each onto its subtree; pretrained only when both load."""
    init = init_params(jax.random.PRNGKey(0))
    det, m0 = load_params_auto(
        conf.get("model_detector_name", "dedode_detector_L.pth"),
        init["detector"], "dedode_detector")
    desc, m1 = load_params_auto(
        conf.get("model_descriptor_name", "dedode_descriptor_B.pth"),
        init["descriptor"], "dedode_descriptor")
    pretrained = m0["pretrained"] and m1["pretrained"]
    return ({"detector": det, "descriptor": desc},
            {"pretrained": pretrained})


def coverage_reweight(p, eps=1e-6):
    """Upstream sample_keypoints(increase_coverage=True): divide the
    keypoint distribution by the square root of its local density — a
    separable 51-tap Gaussian (exp(−x²) on linspace(−2, 2, 51)) — so
    top-k spreads across the image instead of clustering on one blob."""
    taps = jnp.exp(-jnp.linspace(-2.0, 2.0, 51) ** 2).astype(p.dtype)
    h, w = p.shape
    x = (p + eps)[None, :, :, None]
    x = lax.conv_general_dilated(
        x, taps.reshape(1, 51, 1, 1), (1, 1), ((0, 0), (25, 25)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = lax.conv_general_dilated(
        x, taps.reshape(51, 1, 1, 1), (1, 1), ((25, 25), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    density = x[0, :, :, 0]
    return p * lax.rsqrt(density + eps)


@functools.partial(
    jax.jit, static_argnames=("max_keypoints", "detection_threshold")
)
def apply(params, image, valid_wh, max_keypoints=4096,
          detection_threshold=0.0):
    x = image.transpose(0, 2, 3, 1)
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    b, h, w, _ = x.shape

    def per_image(xi, vwh):
        feats = vgg19_apply(params["detector"]["encoder"], xi[None])
        logits = decoder_apply(params["detector"]["decoder"], feats,
                               1)[0, ..., 0]
        p = jax.nn.softmax(logits.reshape(-1), -1).reshape(h, w)
        s = coverage_reweight(p)
        # upstream detect() always returns exactly num_keypoints (top-k
        # indices, no score threshold) — mask only the padded canvas,
        # with a -1 sentinel so genuine zero-probability pixels (softmax
        # underflow) still rank above it
        valid = nms_ops.border_mask(h, w, 0, valid_wh=vwh,
                                    dtype=jnp.bool_)
        s = jnp.where(valid, s, -1.0)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            s, max_keypoints,
            detection_threshold if detection_threshold > 0 else -0.5)

        dfeats = vgg19_apply(params["descriptor"]["encoder"], xi[None])
        dmap = decoder_apply(params["descriptor"]["decoder"], dfeats,
                             DESC_DIM)[0]
        # upstream describe_keypoints: bilinear grid_sample at the
        # normalised keypoints, align_corners=False
        gx = 2.0 * (kpts[:, 0] + 0.5) / w - 1.0
        gy = 2.0 * (kpts[:, 1] + 0.5) / h - 1.0
        desc = grid_sample(dmap, jnp.stack([gx, gy], -1), "bilinear")
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        return kpts, kscores, desc.T, mask

    kpts, kscores, desc, mask = jax.vmap(per_image)(x, valid_wh)
    return {"keypoints": kpts, "scores": kscores, "descriptors": desc,
            "mask": mask}


class DeDoDe(BaseModel):
    """Reference contract: imcui/hloc/extractors/dedode.py:20."""

    default_conf = {
        "name": "dedode",
        "model_detector_name": "dedode_detector_L.pth",
        "model_descriptor_name": "dedode_descriptor_B.pth",
        "max_keypoints": 2000,
        "match_threshold": 0.2,
        "dense": False,
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        if conf["max_keypoints"] in (-1, None):
            conf["max_keypoints"] = 2000

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))
        b, _, h, w = image.shape
        hp, wp = -(-h // 8) * 8, -(-w // 8) * 8     # 3 pools → /8
        if (hp, wp) != (h, w):
            image = jnp.pad(image, ((0, 0), (0, 0), (0, hp - h),
                                    (0, wp - w)))
        valid_wh = jnp.asarray(
            data.get("valid_wh",
                     jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))),
            jnp.int32,
        )
        return apply(self.params, image, valid_wh,
                     max_keypoints=self.conf["max_keypoints"])
