"""RaCo extractor (ranked covariance-aware keypoints + ALIKED descriptors),
native JAX.

Reference contract: imcui/hloc/extractors/raco.py:16-66 — the wrapper runs
the RaCo detector (max_num_keypoints, nms_radius, subpixel sampling with a
temperature, a learned ranker head and a covariance estimator head) to get
keypoints + scores, then describes them with a separate ALIKED network
(``describe``). The design: a small CNN produces a detection heatmap, a
ranker map (learned keypoint quality used for ordering) and a 3-channel
covariance map (per-point localisation uncertainty).

TPU-first: subpixel sampling = temperature-weighted soft-argmax in local
windows (a reduce_window pattern); the ranker re-ordering is one fixed-k
top_k; description reuses our native ALIKED SDDH head on the same image.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import batch_norm_inference, conv2d, init_conv, max_pool, relu
from .aliked import ALIKED


def init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _cbr(key, cin, cout):
    return {"conv": init_conv(key, 3, 3, cin, cout, bias=False),
            "bn": init_bn(cout)}


def init_params(rng):
    keys = jax.random.split(rng, 8)
    return {
        "trunk": [_cbr(keys[0], 3, 32), _cbr(keys[1], 32, 32),
                  _cbr(keys[2], 32, 64), _cbr(keys[3], 64, 64)],
        "heat": init_conv(keys[4], 1, 1, 64, 1),
        "ranker": init_conv(keys[5], 1, 1, 64, 1),
        "cov": init_conv(keys[6], 1, 1, 64, 3),  # (σxx, σyy, σxy)
    }


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("raco/" + str(conf.get("model_name", "raco")), init, "raco")


def backbone(params, x):
    for i, p in enumerate(params["trunk"]):
        x = relu(batch_norm_inference(p["bn"], conv2d(p["conv"], x)))
        if i == 1:
            x = max_pool(x)
    heat = jax.nn.sigmoid(conv2d(params["heat"], x))[..., 0]
    rank = jax.nn.sigmoid(conv2d(params["ranker"], x))[..., 0]
    cov = jax.nn.softplus(conv2d(params["cov"], x))
    return heat, rank, cov


@functools.partial(
    jax.jit,
    static_argnames=("max_keypoints", "nms_radius", "subpixel",
                     "sort_by_ranker"))
def detect(params, image, valid_wh, max_keypoints=1024, nms_radius=3,
           subpixel=True, subpixel_temp=0.5, sort_by_ranker=False):
    heat, rank, cov = backbone(params, image.transpose(0, 2, 3, 1))
    h, w = heat.shape[1:]

    def per_image(s, r, c, vwh):
        s = nms_ops.simple_nms(s, nms_radius)
        s = s * nms_ops.border_mask(
            h, w, 2, valid_wh=(vwh + 1) // 2, dtype=s.dtype)
        score = s * r if sort_by_ranker else s
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            score, max_keypoints, 0.0)
        if subpixel:
            kpts = nms_ops.soft_argmax_refinement(
                kpts, jnp.power(jnp.maximum(s, 0.0), 1.0 / subpixel_temp))
        ix = jnp.clip(kpts[:, 0].astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(kpts[:, 1].astype(jnp.int32), 0, h - 1)
        return kpts * 2.0, kscores, c[iy, ix], mask

    return jax.vmap(per_image)(heat, rank, cov, valid_wh)


class RaCo(BaseModel):
    """Reference contract: imcui/hloc/extractors/raco.py:16 — RaCo detects
    and ranks, ALIKED describes."""

    default_conf = {
        "model_name": "raco",
        "max_num_keypoints": 1024,
        "nms_radius": 3,
        "subpixel_sampling": True,
        "subpixel_temp": 0.5,
        "ranker": True,
        "covariance_estimator": True,
        "sort_by_ranker": False,
        "aliked_model_name": "aliked-n16",
        "aliked_detection_threshold": 0.2,
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        self.describer = ALIKED({
            "model_name": conf["aliked_model_name"],
            "max_num_keypoints": conf["max_num_keypoints"],
            "detection_threshold": conf["aliked_detection_threshold"],
            "nms_radius": 2,
        })

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))
        b, _, h, w = image.shape
        valid_wh = jnp.asarray(
            data.get("valid_wh",
                     jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))),
            jnp.int32)
        kpts, scores, cov, mask = detect(
            self.params, image, valid_wh,
            max_keypoints=int(self.conf["max_num_keypoints"]),
            nms_radius=int(self.conf["nms_radius"]),
            subpixel=bool(self.conf["subpixel_sampling"]),
            subpixel_temp=float(self.conf["subpixel_temp"]),
            sort_by_ranker=bool(self.conf["sort_by_ranker"]))
        # describe the RaCo keypoints with the ALIKED SDDH head at the
        # same locations (reference: aliked.describe(keypoints, image))
        desc = self.describer.describe(image, kpts, valid_wh)
        out = {"keypoints": kpts, "scores": scores, "descriptors": desc,
               "mask": mask}
        if self.conf["covariance_estimator"]:
            out["covariance"] = cov
        return out
