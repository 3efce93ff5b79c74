"""LiftFeat extractor (3D-geometry-lifted lightweight features), native JAX.

Reference contract: imcui/hloc/extractors/liftfeat.py:13-55 — the wrapper
runs third_party/LiftFeat (detect_threshold, top_k) and returns
(keypoints, scores, descriptors(128)) with a score-sorted cut. The design
is an XFeat-style lightweight pyramid whose descriptors are "lifted" by an
auxiliary surface-normal head: normal features are fused into the
descriptor so it encodes local 3D orientation, trained by depth-normal
distillation. At inference the fusion is a second head + 1×1 mix.

TPU-first: one shared pyramid, keypoint head at /8 with an 8×8
space-to-depth logits block (xfeat-style, cheap and exactly MXU-shaped),
descriptor = L2-normalised (desc_head + normal_head) mix at /8.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import batch_norm_inference, conv2d, init_conv, max_pool, relu

DESC_DIM = 128


def init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _cbr(key, cin, cout):
    return {"conv": init_conv(key, 3, 3, cin, cout, bias=False),
            "bn": init_bn(cout)}


def init_params(rng):
    keys = jax.random.split(rng, 12)
    return {
        "b1": [_cbr(keys[0], 1, 24), _cbr(keys[1], 24, 24)],     # /2
        "b2": [_cbr(keys[2], 24, 48), _cbr(keys[3], 48, 48)],    # /4
        "b3": [_cbr(keys[4], 48, 96), _cbr(keys[5], 96, 96)],    # /8
        "kpt": init_conv(keys[6], 1, 1, 96, 65),                 # 8×8 + dust
        "desc": [_cbr(keys[7], 96, 128), init_conv(keys[8], 1, 1, 128,
                                                   DESC_DIM)],
        "normal": [_cbr(keys[9], 96, 64), init_conv(keys[10], 1, 1, 64,
                                                    DESC_DIM)],
        "rel": init_conv(keys[11], 1, 1, 96, 1),                 # reliability
    }


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("liftfeat/" + conf.get("model_name",
                                               "LiftFeat.pth"), init, "liftfeat")


def _block(ps, x, pool=True):
    for p in ps:
        x = relu(batch_norm_inference(p["bn"], conv2d(p["conv"], x)))
    return max_pool(x) if pool else x


def backbone(params, x):
    x = max_pool(_block(params["b1"], x, pool=False))
    x = max_pool(_block(params["b2"], x, pool=False))
    f8 = _block(params["b3"], x, pool=False)

    # keypoint logits: 65-way per 8×8 cell, depth-to-space to full res
    logits = conv2d(params["kpt"], f8)
    prob = jax.nn.softmax(logits, -1)[..., :64]
    b, hc, wc, _ = prob.shape
    heat = prob.reshape(b, hc, wc, 8, 8).transpose(0, 1, 3, 2, 4)
    heat = heat.reshape(b, hc * 8, wc * 8)

    d = relu(batch_norm_inference(params["desc"][0]["bn"],
                                  conv2d(params["desc"][0]["conv"], f8)))
    d = conv2d(params["desc"][1], d)
    n = relu(batch_norm_inference(params["normal"][0]["bn"],
                                  conv2d(params["normal"][0]["conv"], f8)))
    n = conv2d(params["normal"][1], n)
    desc = d + n  # 3D lift: fuse normal features into the descriptor
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    rel = jax.nn.sigmoid(conv2d(params["rel"], f8))[..., 0]
    return heat, desc, rel


@functools.partial(jax.jit, static_argnames=("max_keypoints", "threshold"))
def apply(params, image, valid_wh, max_keypoints=5000, threshold=0.05):
    heat, desc_map, rel = backbone(params, image.transpose(0, 2, 3, 1))
    h, w = heat.shape[1:]

    def per_image(s, dmap, r, vwh):
        s = nms_ops.simple_nms(s, 2)
        s = s * nms_ops.border_mask(h, w, 4, valid_wh=vwh, dtype=s.dtype)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            s, max_keypoints, threshold)
        # reliability-weighted score (LiftFeat ranks by det×rel)
        ix = jnp.clip((kpts[:, 0] / 8).astype(jnp.int32), 0,
                      r.shape[1] - 1)
        iy = jnp.clip((kpts[:, 1] / 8).astype(jnp.int32), 0,
                      r.shape[0] - 1)
        kscores = kscores * r[iy, ix]
        d = nms_ops.sample_descriptors(kpts, dmap.transpose(2, 0, 1), s=8)
        return kpts, kscores, d, mask

    kp, sc, d, mask = jax.vmap(per_image)(heat, desc_map, rel, valid_wh)
    return {"keypoints": kp, "scores": sc, "descriptors": d, "mask": mask}


class Liftfeat(BaseModel):
    """Reference contract: imcui/hloc/extractors/liftfeat.py:13."""

    default_conf = {
        "keypoint_threshold": 0.05,
        "max_keypoints": 5000,
        "model_name": "LiftFeat.pth",
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
        # the published 0.05 gate applies to calibrated heatmaps; with
        # random-init parity weights the top-k cut dominates, so gate ≥ 0
        thr = min(float(self.conf["keypoint_threshold"]),
                  0.05 if self.meta.get("pretrained") else 0.0)
        return apply(
            self.params, image, valid_wh,
            max_keypoints=int(self.conf["max_keypoints"]),
            threshold=thr)
