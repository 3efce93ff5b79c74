"""RDD extractor (Robust Dense Detector — deformable-attention features),
native JAX.

Reference contract: imcui/hloc/extractors/rdd.py:13-59 — the wrapper builds
third_party/rdd RDD (top_k, detection_threshold), runs ``extract`` and
applies a score-sorted max_keypoints cut; descriptors are 256-d. The
published design pairs a CNN pyramid with a deformable-attention
transformer encoder over multi-scale tokens: each token attends to a small
learned set of sampled locations across scales, giving detection that is
robust to large scale/viewpoint change.

TPU-first: deformable sampling = bilinear gathers at predicted offsets —
a gather + einsum per head over fixed-size token sets (static shapes, MXU
matmuls), not a dynamic sparse op. Two encoder layers over the /8 tokens
with 4 sampling points per scale.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import (batch_norm_inference, conv2d, init_conv, init_linear,
                      layer_norm, init_layer_norm, linear, max_pool, relu)

DESC_DIM = 256
D_MODEL = 256
N_POINTS = 4
N_LAYERS = 2


def init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _cbr(key, cin, cout):
    return {"conv": init_conv(key, 3, 3, cin, cout, bias=False),
            "bn": init_bn(cout)}


def init_deform_layer(key, d):
    k = jax.random.split(key, 6)
    return {
        "offset": init_linear(k[0], d, N_POINTS * 2),
        "attn_w": init_linear(k[1], d, N_POINTS),
        "value": init_linear(k[2], d, d),
        "out": init_linear(k[3], d, d),
        "ffn1": init_linear(k[4], d, d * 2),
        "ffn2": init_linear(k[5], d * 2, d),
        "ln1": init_layer_norm(d),
        "ln2": init_layer_norm(d),
    }


def init_params(rng):
    keys = jax.random.split(rng, 10)
    return {
        "b1": [_cbr(keys[0], 3, 32), _cbr(keys[1], 32, 32)],
        "b2": [_cbr(keys[2], 32, 64), _cbr(keys[3], 64, 64)],
        "b3": [_cbr(keys[4], 64, 128), _cbr(keys[5], 128, D_MODEL)],
        "enc": [init_deform_layer(k, D_MODEL)
                for k in jax.random.split(keys[6], N_LAYERS)],
        "det": init_conv(keys[7], 1, 1, D_MODEL, 1),
        "desc": init_conv(keys[8], 1, 1, D_MODEL, DESC_DIM),
    }


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("rdd/" + conf.get("model_name", "RDD-v2.pth"), init, "rdd")


def _bilinear_at(fmap, xy):
    """fmap: (H, W, C); xy: (..., 2) in feature coords → (..., C)."""
    h, w, _ = fmap.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.0)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    v00 = fmap[y0, x0]
    v01 = fmap[y0, x1]
    v10 = fmap[y1, x0]
    v11 = fmap[y1, x1]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def deform_layer(p, fmap):
    """One deformable self-attention encoder layer over a (H, W, D) map:
    each location attends to N_POINTS predicted sample positions."""
    h, w, d = fmap.shape
    x = fmap.reshape(-1, d)
    gy, gx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    ref = jnp.stack([gx, gy], -1).reshape(-1, 2).astype(jnp.float32)

    offs = linear(p["offset"], x).reshape(-1, N_POINTS, 2)
    attn = jax.nn.softmax(linear(p["attn_w"], x), -1)  # (N, P)
    vmap_ = linear(p["value"], fmap)                   # (H, W, D)
    sampled = _bilinear_at(vmap_, ref[:, None, :] + offs)  # (N, P, D)
    agg = (attn[..., None] * sampled).sum(1)
    x = layer_norm(p["ln1"], x + linear(p["out"], agg))
    x = layer_norm(p["ln2"], x + linear(p["ffn2"],
                                        relu(linear(p["ffn1"], x))))
    return x.reshape(h, w, d)


def _block(ps, x):
    for p in ps:
        x = relu(batch_norm_inference(p["bn"], conv2d(p["conv"], x)))
    return x


def backbone(params, x):
    x = max_pool(_block(params["b1"], x))
    x = max_pool(_block(params["b2"], x))
    f8 = _block(params["b3"], x)  # (B, H/8, W/8, D)
    f8 = jax.vmap(lambda f: functools.reduce(
        lambda a, p: deform_layer(p, a), params["enc"], f))(f8)
    score = jax.nn.softplus(conv2d(params["det"], f8))[..., 0]
    desc = conv2d(params["desc"], f8)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    return score, desc


@functools.partial(jax.jit, static_argnames=("max_keypoints", "threshold"))
def apply(params, image, valid_wh, max_keypoints=4096, threshold=0.0):
    score, desc_map = backbone(params, image.transpose(0, 2, 3, 1))
    h, w = score.shape[1:]

    def per_image(s, dmap, vwh):
        s = nms_ops.simple_nms(s, 1)
        s = s * nms_ops.border_mask(
            h, w, 1, valid_wh=(vwh + 7) // 8, dtype=s.dtype)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            s, max_keypoints, threshold)
        kpts = nms_ops.soft_argmax_refinement(kpts, s) * 8.0
        d = nms_ops.sample_descriptors(kpts, dmap.transpose(2, 0, 1), s=8)
        return kpts, kscores, d, mask

    kp, sc, d, mask = jax.vmap(per_image)(score, desc_map, valid_wh)
    return {"keypoints": kp, "scores": sc, "descriptors": d, "mask": mask}


class Rdd(BaseModel):
    """Reference contract: imcui/hloc/extractors/rdd.py:13."""

    default_conf = {
        "keypoint_threshold": 0.1,
        "max_keypoints": 4096,
        "model_name": "RDD-v2.pth",
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
                     threshold=0.0)
