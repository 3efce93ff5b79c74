"""SFD2 extractor (semantic-guided feature detection and description),
native JAX.

Reference contract: imcui/hloc/extractors/sfd2.py:15-52 — the wrapper
ImageNet-normalises RGB, runs pram's ``load_sfd2`` ResNet4x network with
``extract_local_global`` and returns (keypoints, scores, descriptors) with
conf_th gating and max_keypoints. The design: a ResNet encoder at 1/4
resolution whose detection head is modulated by a semantic stability head
(features on stable man-made structures score higher than transient
regions), plus a 128-d descriptor head.

TPU-first: the semantic gate is a sigmoid map multiplied into the detector
score before the fixed-k masked top-k; everything is one NHWC conv program.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..backbones.resnet import basic_block, init_basic_block
from ..layers import batch_norm_inference, conv2d, init_conv, max_pool, relu

DESC_DIM = 128
IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_params(rng):
    keys = jax.random.split(rng, 10)
    params = {
        "stem": {"conv": init_conv(keys[0], 7, 7, 3, 64, bias=False),
                 "bn": init_bn(64)},
        "layer1": [init_basic_block(keys[1], 64, 64, 1),
                   init_basic_block(keys[2], 64, 64, 1)],
        "layer2": [init_basic_block(keys[3], 64, 128, 2),
                   init_basic_block(keys[4], 128, 128, 1)],
        "det": [init_conv(keys[5], 3, 3, 128, 128),
                init_conv(keys[6], 1, 1, 128, 1)],
        "sem": [init_conv(keys[7], 3, 3, 128, 128),
                init_conv(keys[8], 1, 1, 128, 1)],
        "desc": init_conv(keys[9], 1, 1, 128, DESC_DIM),
    }
    return params


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("pram/" + conf.get(
        "model_name", "sfd2_20230511_210205_resnet4x.79.pth"), init, "sfd2")


def backbone(params, x):
    """x: (B, H, W, 3) normalised → score (B, H/4, W/4), desc map."""
    s = params["stem"]
    x = relu(batch_norm_inference(s["bn"], conv2d(s["conv"], x, stride=2)))
    x = max_pool(x, 3, 2)
    for blk in params["layer1"]:
        x = basic_block(blk, x, 1)
    for i, blk in enumerate(params["layer2"]):
        x = basic_block(blk, x, 2 if i == 0 else 1)
    # ResNet4x: stem(2)·pool(2)·layer2(2) = /8 — upsample back to /4 so
    # keypoints keep quarter-resolution localisation
    b, h, w, c = x.shape
    x4 = jax.image.resize(x, (b, h * 2, w * 2, c), "bilinear")

    det = jax.nn.softplus(
        conv2d(params["det"][1], relu(conv2d(params["det"][0], x4))))
    sem = jax.nn.sigmoid(
        conv2d(params["sem"][1], relu(conv2d(params["sem"][0], x4))))
    desc = conv2d(params["desc"], x4)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    return (det * sem)[..., 0], desc


@functools.partial(jax.jit, static_argnames=("max_keypoints", "conf_th"))
def apply(params, image, valid_wh, max_keypoints=4096, conf_th=0.001):
    x = image.transpose(0, 2, 3, 1)
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    score, desc_map = backbone(params, x)
    h, w = score.shape[1:]

    def per_image(s, dmap, vwh):
        s = nms_ops.simple_nms(s, 2)
        s = s * nms_ops.border_mask(
            h, w, 2, valid_wh=(vwh + 3) // 4, dtype=s.dtype)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            s, max_keypoints, conf_th)
        d = nms_ops.sample_descriptors(
            kpts * 4.0, dmap.transpose(2, 0, 1), s=4)
        return kpts * 4.0, kscores, d, mask

    kp, sc, d, mask = jax.vmap(per_image)(score, desc_map, valid_wh)
    return {"keypoints": kp, "scores": sc, "descriptors": d, "mask": mask}


class SFD2(BaseModel):
    """Reference contract: imcui/hloc/extractors/sfd2.py:15."""

    default_conf = {
        "max_keypoints": 4096,
        "model_name": "sfd2_20230511_210205_resnet4x.79.pth",
        "conf_th": 0.001,
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))
        b, _, h, w = image.shape
        valid_wh = jnp.asarray(
            data.get("valid_wh",
                     jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))),
            jnp.int32)
        return apply(self.params, image, valid_wh,
                     max_keypoints=int(self.conf["max_keypoints"]),
                     conf_th=float(self.conf["conf_th"]))
