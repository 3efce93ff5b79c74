"""DeDoDe decoupled detector + descriptor, native JAX/XLA.

Re-implementation of the architecture family behind the reference wrapper
(reference: imcui/hloc/extractors/dedode.py:20 — the DeDoDe submodule:
"detect, don't describe / describe, don't detect": two independent
networks. The detector is a VGG encoder + upsampling decoder producing a
keypoint *logit distribution* over pixels (keypoints are its top modes);
the descriptor is a separate VGG encoder + decoder producing a dense
256-d map sampled at the detected points).

TPU-first: both nets run as one batched NHWC conv program; the detector's
distribution → fixed-k masked top-k; descriptor sampling is the shared
bilinear gather. Encoder weights are shared across the two decoders here
only at init-shape level — the upstream ships two separate checkpoints
(dedode_detector_L, dedode_descriptor_B) and conversion maps each
independently on availability.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import conv2d, init_conv, max_pool, relu

VGG_BLOCKS = [(64, 2), (128, 2), (256, 3)]  # (channels, convs) per stage
DESC_DIM = 256


def init_vgg(rng, cin=3):
    keys = jax.random.split(rng, 8)
    params = []
    ki = 0
    c = cin
    for cout, n in VGG_BLOCKS:
        stage = []
        for _ in range(n):
            stage.append(init_conv(keys[ki], 3, 3, c, cout))
            ki += 1
            c = cout
        params.append(stage)
    return params


def vgg_apply(params, x):
    """Returns per-stage feature maps at 1/1, 1/2, 1/4."""
    feats = []
    for si, stage in enumerate(params):
        for p in stage:
            x = relu(conv2d(p, x))
        feats.append(x)
        if si < len(params) - 1:
            x = max_pool(x)
    return feats


def init_decoder(rng, cout):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "up1": init_conv(k1, 3, 3, 256 + 128, 128),
        "up2": init_conv(k2, 3, 3, 128 + 64, 64),
        "out": init_conv(k3, 1, 1, 64, cout),
    }


def decoder_apply(p, feats):
    f1, f2, f3 = feats  # 1/1 (64), 1/2 (128), 1/4 (256)

    def up2x(x):
        b, h, w, c = x.shape
        return jax.image.resize(x, (b, 2 * h, 2 * w, c), "bilinear")

    x = relu(conv2d(p["up1"], jnp.concatenate([up2x(f3), f2], -1)))
    x = relu(conv2d(p["up2"], jnp.concatenate([up2x(x), f1], -1)))
    return conv2d(p["out"], x)


def init_params(rng):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "detector": {"encoder": init_vgg(k1), "decoder": init_decoder(k2, 1)},
        "descriptor": {"encoder": init_vgg(k3),
                       "decoder": init_decoder(k4, DESC_DIM)},
    }


def load_params(conf):
    """DeDoDe ships detector and descriptor as separate checkpoints
    (reference conf: imcui/hloc/extractors/dedode.py) — convert each onto
    its subtree; pretrained only when both load."""
    init = init_params(jax.random.PRNGKey(0))
    det, m0 = load_params_auto(
        "dedode_detector_L.pth", init["detector"], "dedode_detector")
    desc, m1 = load_params_auto(
        "dedode_descriptor_B.pth", init["descriptor"], "dedode_descriptor")
    pretrained = m0["pretrained"] and m1["pretrained"]
    return ({"detector": det, "descriptor": desc},
            {"pretrained": pretrained})


@functools.partial(
    jax.jit, static_argnames=("max_keypoints", "detection_threshold")
)
def apply(params, image, valid_wh, max_keypoints=4096,
          detection_threshold=0.0):
    x = image.transpose(0, 2, 3, 1)
    det_logits = decoder_apply(
        params["detector"]["decoder"],
        vgg_apply(params["detector"]["encoder"], x))[..., 0]
    b, h, w = det_logits.shape
    # keypoint distribution over pixels (DeDoDe's softmax formulation)
    flat = jax.nn.softmax(det_logits.reshape(b, -1), -1).reshape(b, h, w)

    desc_map = decoder_apply(
        params["descriptor"]["decoder"],
        vgg_apply(params["descriptor"]["encoder"], x))
    desc_map = desc_map / jnp.maximum(
        jnp.linalg.norm(desc_map, axis=-1, keepdims=True), 1e-8)

    def per_image(scores, dmap, vwh):
        s = nms_ops.simple_nms(scores, 2)
        s = s * nms_ops.border_mask(h, w, 2, valid_wh=vwh, dtype=s.dtype)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            s, max_keypoints, detection_threshold)
        ix = jnp.clip(kpts[:, 0].astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(kpts[:, 1].astype(jnp.int32), 0, h - 1)
        return kpts, kscores, dmap[iy, ix].T, mask

    kpts, kscores, desc, mask = jax.vmap(per_image)(flat, desc_map,
                                                    valid_wh)
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
        hp, wp = -(-h // 4) * 4, -(-w // 4) * 4
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
