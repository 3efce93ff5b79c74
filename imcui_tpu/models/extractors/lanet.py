"""LANet extractor (self-supervised learning-aware keypoints), native JAX.

Reference contract: imcui/hloc/extractors/lanet.py:20-66 — the wrapper runs
third_party/lanet PointModel (is_test) and post-processes
(keypoints, scores, descriptors) with a keypoint_threshold gate and a
score-sorted max_keypoints cut. The PointModel design it loads is a
VGG-style shared encoder at 1/8 resolution with three heads: a score head
(cell confidence), a location head (sub-cell offsets in (-1, 1) mapped to
pixel coords), and a 256-d descriptor head.

TPU-first: all three heads come out of one dense NHWC conv stack; the
threshold is a mask rule and the cut is a fixed-k top-k, so the whole
extractor is one fixed-shape jitted program per image bucket.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import batch_norm_inference, conv2d, init_conv, max_pool, relu

CELL = 8
DESC_DIM = 256
ENC_CFG = [64, 64, 128, 128, 256, 256]  # pools after idx 1 and 3


def init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_params(rng):
    keys = jax.random.split(rng, len(ENC_CFG) + 6)
    params = {"enc": []}
    cin = 1
    for k, cout in zip(keys, ENC_CFG):
        params["enc"].append({"conv": init_conv(k, 3, 3, cin, cout,
                                                bias=False),
                              "bn": init_bn(cout)})
        cin = cout
    # one extra stride-2 stage to reach 1/8 before the heads
    params["enc"].append({"conv": init_conv(keys[-6], 3, 3, 256, 256,
                                            bias=False),
                          "bn": init_bn(256)})
    params["score"] = [init_conv(keys[-5], 3, 3, 256, 256),
                       init_conv(keys[-4], 1, 1, 256, 1)]
    params["loc"] = [init_conv(keys[-3], 3, 3, 256, 256),
                     init_conv(keys[-2], 1, 1, 256, 2)]
    params["desc"] = [init_conv(keys[-1], 3, 3, 256, DESC_DIM)]
    return params


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("lanet/" + conf.get("model_name",
                                            "PointModel_v0.pth"), init, "lanet")


def heads(params, x):
    """x: (B, H, W, 1) → score (B, Hc, Wc), kpts (B, Hc, Wc, 2) pixel
    coords, desc (B, Hc, Wc, D) at 1/8 resolution."""
    for i, p in enumerate(params["enc"][:-1]):
        x = relu(batch_norm_inference(p["bn"], conv2d(p["conv"], x)))
        if i in (1, 3):
            x = max_pool(x)
    p = params["enc"][-1]
    x = relu(batch_norm_inference(p["bn"], conv2d(p["conv"], x, stride=2)))

    s = jax.nn.sigmoid(
        conv2d(params["score"][1], relu(conv2d(params["score"][0], x))))
    loc = jnp.tanh(
        conv2d(params["loc"][1], relu(conv2d(params["loc"][0], x))))
    desc = conv2d(params["desc"][0], x)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)

    hc, wc = s.shape[1:3]
    gy, gx = jnp.meshgrid(jnp.arange(hc), jnp.arange(wc), indexing="ij")
    centers = jnp.stack([gx, gy], -1).astype(jnp.float32) * CELL + CELL / 2
    kpts = centers[None] + loc * (CELL / 2)
    return s[..., 0], kpts, desc


@functools.partial(jax.jit,
                   static_argnames=("max_keypoints", "threshold"))
def apply(params, image, valid_wh, max_keypoints=1024, threshold=0.1):
    score, kpts, desc = heads(params, image.transpose(0, 2, 3, 1))
    b, hc, wc = score.shape

    def per_image(s, kp, dm, vwh):
        # gate by threshold and the valid region, then fixed-k top-k over
        # the flattened cells (reference post-processing: lanet.py:49-58)
        in_img = (kp[..., 0] < vwh[0]) & (kp[..., 1] < vwh[1])
        s = jnp.where((s > threshold) & in_img, s, 0.0)
        flat = s.reshape(-1)
        k = min(max_keypoints, flat.shape[0])
        vals, idx = jax.lax.top_k(flat, k)
        sel_kp = kp.reshape(-1, 2)[idx]
        sel_d = dm.reshape(-1, DESC_DIM)[idx]
        mask = vals > 0.0
        return sel_kp, vals, sel_d.T, mask

    kp, sc, d, mask = jax.vmap(per_image)(score, kpts, desc, valid_wh)
    return {"keypoints": kp, "scores": sc, "descriptors": d, "mask": mask}


class LANet(BaseModel):
    """Reference contract: imcui/hloc/extractors/lanet.py:20."""

    default_conf = {
        "model_name": "PointModel_v0.pth",
        "keypoint_threshold": 0.1,
        "max_keypoints": 1024,
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 3:
            image = image.mean(1, keepdims=True)
        b, _, h, w = image.shape
        valid_wh = jnp.asarray(
            data.get("valid_wh",
                     jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))),
            jnp.int32)
        return apply(self.params, image, valid_wh,
                     max_keypoints=int(self.conf["max_keypoints"]),
                     threshold=float(self.conf["keypoint_threshold"]))
