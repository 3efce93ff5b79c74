"""ALIKE keypoint detector + descriptor, native JAX/XLA.

Re-implementation of the architecture behind the reference wrapper
(reference: imcui/hloc/extractors/alike.py:18, wrapping the ALIKE
submodule — rebuilt from the published design: 4-stage conv encoder
(ConvBlock + 3 ResBlocks with 2×2 pooling), per-stage 1×1 projections to
dim/4 channels, bilinear upsampling + concatenation to a full-resolution
feature map, a single head producing a dim-d descriptor map + a sigmoid
score map, and DKD-style differentiable keypoint detection: window NMS +
sub-pixel soft-argmax refinement).

The ALIKED variant's deformable SDDH head is future work; this covers the
alike-{t,s,n,l} family sizes via the c1..c4/dim conf.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import conv2d, init_conv, max_pool, relu

SIZES = {
    "alike-t": dict(c1=8, c2=16, c3=32, c4=64, dim=64),
    "alike-s": dict(c1=8, c2=16, c3=48, c4=96, dim=96),
    "alike-n": dict(c1=16, c2=32, c3=64, c4=128, dim=128),
    "alike-l": dict(c1=32, c2=64, c3=128, c4=128, dim=128),
}


def init_conv_block(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {"conv1": init_conv(k1, 3, 3, cin, cout),
            "conv2": init_conv(k2, 3, 3, cout, cout)}


def conv_block(p, x):
    return relu(conv2d(p["conv2"], relu(conv2d(p["conv1"], x))))


def init_res_block(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": init_conv(k1, 3, 3, cin, cout),
        "conv2": init_conv(k2, 3, 3, cout, cout),
        "downsample": init_conv(k3, 1, 1, cin, cout),
    }


def res_block(p, x):
    y = relu(conv2d(p["conv1"], x))
    y = conv2d(p["conv2"], y)
    return relu(y + conv2d(p["downsample"], x))


def init_params(rng, c1, c2, c3, c4, dim):
    keys = jax.random.split(rng, 10)
    q = dim // 4
    return {
        "block1": init_conv_block(keys[0], 3, c1),
        "block2": init_res_block(keys[1], c1, c2),
        "block3": init_res_block(keys[2], c2, c3),
        "block4": init_res_block(keys[3], c3, c4),
        "conv1": init_conv(keys[4], 1, 1, c1, q),
        "conv2": init_conv(keys[5], 1, 1, c2, q),
        "conv3": init_conv(keys[6], 1, 1, c3, q),
        "conv4": init_conv(keys[7], 1, 1, c4, q),
        "convhead2": init_conv(keys[8], 1, 1, dim, dim + 1),
    }


def load_params(conf):
    sizes = SIZES[conf.get("model_name", "alike-n")]
    init = init_params(jax.random.PRNGKey(0), **sizes)
    return load_params_auto(conf.get("model_name", "alike-n") + ".pth", init, "alike")


def backbone(p, x):
    """x: (B, H, W, 3) → descriptor map (B, H, W, dim), scores (B, H, W)."""
    x1 = conv_block(p["block1"], x)           # full res
    x2 = res_block(p["block2"], max_pool(x1))  # 1/2
    x3 = res_block(p["block3"], max_pool(x2))  # 1/4
    x4 = res_block(p["block4"], max_pool(x3))  # 1/8

    def up(feat, factor):
        b, h, w, c = feat.shape
        return jax.image.resize(feat, (b, h * factor, w * factor, c),
                                method="bilinear")

    f1 = relu(conv2d(p["conv1"], x1))
    f2 = up(relu(conv2d(p["conv2"], x2)), 2)
    f3 = up(relu(conv2d(p["conv3"], x3)), 4)
    f4 = up(relu(conv2d(p["conv4"], x4)), 8)
    feats = jnp.concatenate([f1, f2, f3, f4], -1)
    head = conv2d(p["convhead2"], feats)
    desc = head[..., :-1]
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
        ix = jnp.clip(kpts[:, 0].astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(kpts[:, 1].astype(jnp.int32), 0, h - 1)
        d = dmap[iy, ix]
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
        hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
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
