"""R2D2 extractor (reliable + repeatable detector/descriptor), native JAX.

Re-implementation of the architecture behind the reference wrapper
(reference: imcui/hloc/extractors/r2d2.py:20 — the r2d2 submodule:
a fully-convolutional dilated L2-Net (no downsampling; the stride-2 stages
are replaced by dilation so the output stays full resolution), a 128-d
descriptor head, and two single-channel heads — repeatability (where to
detect) and reliability (which descriptors to trust); keypoints are local
maxima of repeatability gated by the reliability threshold).

TPU-first: the whole net is dense conv work at full resolution; selection
is the usual fixed-k masked NMS+top-k with the score = repeatability ×
reliability product, thresholds applied as mask rules (reference confs:
reliability_threshold 0.7, repetability_threshold 0.7).
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import batch_norm_inference, conv2d, init_conv, relu

# (cout, dilation) — L2-Net layout with dilation replacing the strides
L2NET_CFG = [(32, 1), (32, 1), (64, 1), (64, 2), (128, 2), (128, 4),
             (128, 4)]


def init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_params(rng):
    keys = jax.random.split(rng, len(L2NET_CFG) + 3)
    params = {"ops": []}
    cin = 3
    for k, (cout, dil) in zip(keys, L2NET_CFG):
        params["ops"].append({
            "conv": init_conv(k, 3, 3, cin, cout, bias=False),
            "bn": init_bn(cout),
        })
        cin = cout
    params["clf"] = init_conv(keys[-3], 1, 1, 128, 2)   # reliability
    params["sal"] = init_conv(keys[-2], 1, 1, 128, 1)   # repeatability
    return params


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto(conf.get("model_name", "r2d2_WASF_N16.pt"), init, "r2d2")


def backbone(params, x):
    for p, (cout, dil) in zip(params["ops"], L2NET_CFG):
        x = relu(batch_norm_inference(
            p["bn"], conv2d(p["conv"], x, dilation=dil)))
    desc = x / jnp.maximum(
        jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
    reliability = jax.nn.softmax(conv2d(params["clf"], x), -1)[..., 1]
    repeatability = jax.nn.sigmoid(conv2d(params["sal"], x))[..., 0]
    return desc, reliability, repeatability


@functools.partial(
    jax.jit,
    static_argnames=("max_keypoints", "reliability_threshold",
                     "repeatability_threshold"),
)
def apply(params, image, valid_wh, max_keypoints=4096,
          reliability_threshold=0.7, repeatability_threshold=0.7):
    x = image.transpose(0, 2, 3, 1)
    desc_map, rel, rep = backbone(params, x)
    h, w = rep.shape[1:]

    def per_image(rel_i, rep_i, dmap, vwh):
        gated = jnp.where(
            (rel_i > reliability_threshold)
            & (rep_i > repeatability_threshold),
            rel_i * rep_i, 0.0,
        )
        s = nms_ops.simple_nms(gated, 3)
        s = s * nms_ops.border_mask(h, w, 4, valid_wh=vwh, dtype=s.dtype)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            s, max_keypoints, 0.0)
        ix = jnp.clip(kpts[:, 0].astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(kpts[:, 1].astype(jnp.int32), 0, h - 1)
        d = dmap[iy, ix]
        return kpts, kscores, d.T, mask

    kpts, kscores, desc, mask = jax.vmap(per_image)(rel, rep, desc_map,
                                                    valid_wh)
    return {"keypoints": kpts, "scores": kscores, "descriptors": desc,
            "mask": mask}


class R2D2(BaseModel):
    """Reference contract: imcui/hloc/extractors/r2d2.py:20."""

    default_conf = {
        "model_name": "r2d2_WASF_N16.pt",
        "max_keypoints": 5000,
        "scale_factor": 2**0.25,
        "min_size": 256,
        "max_size": 1024,
        "min_scale": 0,
        "max_scale": 1,
        "reliability_threshold": 0.7,
        "repetability_threshold": 0.7,
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        if conf["max_keypoints"] in (-1, None):
            conf["max_keypoints"] = 5000

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))
        b, _, h, w = image.shape
        valid_wh = jnp.asarray(
            data.get("valid_wh",
                     jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))),
            jnp.int32,
        )
        return apply(
            self.params, image, valid_wh,
            max_keypoints=self.conf["max_keypoints"],
            reliability_threshold=float(
                self.conf["reliability_threshold"]),
            repeatability_threshold=float(
                self.conf["repetability_threshold"]),
        )
