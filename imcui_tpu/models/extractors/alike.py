"""ALIKE keypoint detector + descriptor, native JAX/XLA.

Re-implementation of the published architecture behind the reference
wrapper (reference: imcui/hloc/extractors/alike.py:18, wrapping the ALIKE
submodule's ALNet + DKD). Published ALNet layout (pinned by the torch
restatement fixture in tests/test_torch_parity3.py):

- encoder: ConvBlock(3→c1) at full res; ResBlocks at strides 1/2, 1/8,
  1/32 — ``pool2`` (2×2) before block2, ``pool4`` (4×4) before block3 and
  block4. All convs are 3×3 bias-free followed by BatchNorm2d; every
  ResBlock carries a plain 1×1 nn.Conv2d (with bias) ``downsample``
  projection on the identity path.
- aggregation: per-stage bias-free 1×1 conv to dim//4 + ReLU, bilinear
  upsampling with ``align_corners=True`` back to full res, channel concat.
- head: optional 1×1 ``convhead1`` + ReLU (``single_head=False`` sizes,
  i.e. alike-l) then 1×1 ``convhead2`` → dim descriptor channels + 1
  score channel (sigmoid). Descriptor map is L2-normalised densely.
- DKD detection: window NMS + threshold/top-k selection + sub-pixel
  soft-argmax refinement, descriptors sampled bilinearly at keypoints.

Param-tree keys mirror the upstream ``alike-*.pth`` state_dict naming
(``block1.conv1/bn1…``, ``block2.downsample``, ``conv1..conv4``,
``convhead2``) so the checkpoint converts mechanically.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...ops.resize import torch_interpolate
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..backbones.resnet import init_bn
from ..layers import batch_norm_inference, conv2d, init_conv, max_pool, relu

SIZES = {
    "alike-t": dict(c1=8, c2=16, c3=32, c4=64, dim=64, single_head=True),
    "alike-s": dict(c1=8, c2=16, c3=48, c4=96, dim=96, single_head=True),
    "alike-n": dict(c1=16, c2=32, c3=64, c4=128, dim=128, single_head=True),
    "alike-l": dict(c1=32, c2=64, c3=128, c4=128, dim=128,
                    single_head=False),
}


def init_conv_block(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {"conv1": init_conv(k1, 3, 3, cin, cout, bias=False),
            "bn1": init_bn(cout),
            "conv2": init_conv(k2, 3, 3, cout, cout, bias=False),
            "bn2": init_bn(cout)}


def conv_block(p, x):
    x = relu(batch_norm_inference(p["bn1"], conv2d(p["conv1"], x)))
    return relu(batch_norm_inference(p["bn2"], conv2d(p["conv2"], x)))


def init_res_block(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": init_conv(k1, 3, 3, cin, cout, bias=False),
        "bn1": init_bn(cout),
        "conv2": init_conv(k2, 3, 3, cout, cout, bias=False),
        "bn2": init_bn(cout),
        # upstream passes downsample=nn.Conv2d(cin, cout, 1) — biased,
        # un-normed (unlike torchvision's conv+bn downsample)
        "downsample": init_conv(k3, 1, 1, cin, cout),
    }


def res_block(p, x):
    y = relu(batch_norm_inference(p["bn1"], conv2d(p["conv1"], x)))
    y = batch_norm_inference(p["bn2"], conv2d(p["conv2"], y))
    return relu(y + conv2d(p["downsample"], x))


def init_params(rng, c1, c2, c3, c4, dim, single_head=True):
    keys = jax.random.split(rng, 10)
    q = dim // 4
    params = {
        "block1": init_conv_block(keys[0], 3, c1),
        "block2": init_res_block(keys[1], c1, c2),
        "block3": init_res_block(keys[2], c2, c3),
        "block4": init_res_block(keys[3], c3, c4),
        "conv1": init_conv(keys[4], 1, 1, c1, q, bias=False),
        "conv2": init_conv(keys[5], 1, 1, c2, q, bias=False),
        "conv3": init_conv(keys[6], 1, 1, c3, q, bias=False),
        "conv4": init_conv(keys[7], 1, 1, c4, q, bias=False),
        "convhead2": init_conv(keys[8], 1, 1, dim, dim + 1, bias=False),
    }
    if not single_head:
        params["convhead1"] = init_conv(keys[9], 1, 1, dim, dim,
                                        bias=False)
    return params


def load_params(conf):
    name = conf.get("model_name", "alike-t")
    init = init_params(jax.random.PRNGKey(0), **SIZES[name])
    return load_params_auto(name + ".pth", init, "alike")


def backbone(p, x):
    """x: (B, H, W, 3), H,W % 32 == 0 → desc map (B, H, W, dim) L2-normed,
    scores (B, H, W) in (0, 1)."""
    x1 = conv_block(p["block1"], x)                      # full res
    x2 = res_block(p["block2"], max_pool(x1))            # 1/2
    x3 = res_block(p["block3"], max_pool(x2, 4, 4))      # 1/8
    x4 = res_block(p["block4"], max_pool(x3, 4, 4))      # 1/32

    h, w = x.shape[1:3]

    def up(feat):
        return torch_interpolate(feat, (h, w), mode="bilinear",
                                 align_corners=True)

    f1 = relu(conv2d(p["conv1"], x1))
    f2 = up(relu(conv2d(p["conv2"], x2)))
    f3 = up(relu(conv2d(p["conv3"], x3)))
    f4 = up(relu(conv2d(p["conv4"], x4)))
    feats = jnp.concatenate([f1, f2, f3, f4], -1)
    if "convhead1" in p:
        feats = relu(conv2d(p["convhead1"], feats))
    head = conv2d(p["convhead2"], feats)
    desc = head[..., :-1]
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    scores = jax.nn.sigmoid(head[..., -1])
    return desc, scores


@functools.partial(
    jax.jit,
    static_argnames=("max_keypoints", "nms_radius", "detection_threshold",
                     "sub_pixel"),
)
def apply(params, image, valid_wh, max_keypoints=1024, nms_radius=2,
          detection_threshold=0.2, sub_pixel=True):
    x = image.transpose(0, 2, 3, 1)
    desc_map, heat = backbone(params, x)
    h, w = heat.shape[1:]

    def per_image(scores, dmap, vwh):
        s = nms_ops.simple_nms(scores, nms_radius)
        s = s * nms_ops.border_mask(h, w, 2, valid_wh=vwh, dtype=s.dtype)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            s, max_keypoints, detection_threshold)
        if sub_pixel:
            kpts = nms_ops.soft_argmax_refinement(kpts, scores, radius=2)
        # bilinear descriptor sampling on the normalised dense map
        d = nms_ops.sample_bilinear(dmap, kpts)
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                            1e-8)
        return kpts, kscores, d.T, mask

    kpts, kscores, desc, mask = jax.vmap(per_image)(heat, desc_map,
                                                    valid_wh)
    return {"keypoints": kpts, "scores": kscores, "descriptors": desc,
            "mask": mask}


class Alike(BaseModel):
    """Reference contract: imcui/hloc/extractors/alike.py:18."""

    default_conf = {
        "model_name": "alike-n",  # alike-t | alike-s | alike-n | alike-l
        "use_relu": True,
        "multiscale": False,
        "max_keypoints": 1024,
        "detection_threshold": 0.2,
        "nms_radius": 2,
        "sub_pixel": True,
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        if conf["max_keypoints"] in (-1, None):
            conf["max_keypoints"] = 4096

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))
        b, _, h, w = image.shape
        hp, wp = -(-h // 32) * 32, -(-w // 32) * 32
        if (hp, wp) != (h, w):
            image = jnp.pad(image, ((0, 0), (0, 0), (0, hp - h),
                                    (0, wp - w)))
        if "valid_wh" in data:
            valid_wh = jnp.asarray(data["valid_wh"], jnp.int32)
        else:
            valid_wh = jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))
        return apply(
            self.params, image, valid_wh,
            max_keypoints=self.conf["max_keypoints"],
            nms_radius=self.conf["nms_radius"],
            detection_threshold=float(self.conf["detection_threshold"]),
            sub_pixel=self.conf["sub_pixel"],
        )
