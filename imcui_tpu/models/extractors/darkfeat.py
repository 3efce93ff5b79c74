"""DarkFeat extractor (noise-robust features for extremely dark RAW/low
light images), native JAX.

Reference contract: imcui/hloc/extractors/darkfeat.py:14-46 — wrapper runs
third_party/DarkFeat and post-processes with a score-sorted max_keypoints
cut; outputs 128-d descriptors. The published design is an ASLFeat-style
multi-level network: a shared conv trunk whose detection score is a
peakiness measure (product of channel-wise and spatial softness) fused
across levels, made illumination-robust by instance-normalising activations
so the detector responds to structure rather than absolute intensity.

TPU-first: instance norm is two reductions fused by XLA into the conv
epilogue; the peakiness windows are `reduce_window` ops; detection is the
shared fixed-k masked NMS+top-k.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import conv2d, init_conv, relu

DESC_DIM = 128
TRUNK = [(32, 1), (32, 1), (64, 2), (64, 1), (128, 2), (128, 1)]


def instance_norm(x, eps=1e-5):
    mu = x.mean((1, 2), keepdims=True)
    var = x.var((1, 2), keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps)


def init_params(rng):
    keys = jax.random.split(rng, len(TRUNK) + 1)
    params = {"trunk": []}
    cin = 3
    for k, (cout, _) in zip(keys, TRUNK):
        params["trunk"].append(init_conv(k, 3, 3, cin, cout, bias=False))
        cin = cout
    params["desc"] = init_conv(keys[-1], 1, 1, 128, DESC_DIM)
    return params


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("darkfeat/" + conf.get("model_name",
                                               "DarkFeat.pth"), init, "darkfeat")


def peakiness(x, ksize=3):
    """ASLFeat-style detection score: spatial × channel peakiness."""
    avg = lax.reduce_window(
        x, 0.0, lax.add, (1, ksize, ksize, 1), (1, 1, 1, 1), "SAME"
    ) / (ksize * ksize)
    alpha = jax.nn.softplus(x - avg)           # spatial peakiness
    beta = jax.nn.softplus(x - x.mean(-1, keepdims=True))  # channel
    return (alpha * beta).max(-1)


def backbone(params, x):
    scores = []
    for i, p in enumerate(params["trunk"]):
        cout, stride = TRUNK[i]
        x = relu(instance_norm(conv2d(p, x, stride=stride)))
        if i in (1, 3, 5):
            scores.append(peakiness(x))
    desc = conv2d(params["desc"], x)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    # fuse the multi-level scores at full resolution
    h, w = scores[0].shape[1:]
    fused = scores[0]
    for s in scores[1:]:
        fused = fused + jax.image.resize(s, (s.shape[0], h, w),
                                         "bilinear")
    return fused / len(scores), desc


@functools.partial(jax.jit,
                   static_argnames=("max_keypoints", "threshold",
                                    "sub_pixel"))
def apply(params, image, valid_wh, max_keypoints=1000, threshold=0.5,
          sub_pixel=False):
    score, desc_map = backbone(params, image.transpose(0, 2, 3, 1))
    h, w = score.shape[1:]

    def per_image(s, dmap, vwh):
        s = nms_ops.simple_nms(s, 2)
        s = s * nms_ops.border_mask(h, w, 8, valid_wh=vwh, dtype=s.dtype)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            s, max_keypoints, threshold)
        if sub_pixel:
            kpts = nms_ops.soft_argmax_refinement(kpts, s)
        d = nms_ops.sample_descriptors(kpts, dmap.transpose(2, 0, 1), s=4)
        return kpts, kscores, d, mask

    kp, sc, d, mask = jax.vmap(per_image)(score, desc_map, valid_wh)
    return {"keypoints": kp, "scores": sc, "descriptors": d, "mask": mask}


class DarkFeat(BaseModel):
    """Reference contract: imcui/hloc/extractors/darkfeat.py:14."""

    default_conf = {
        "model_name": "DarkFeat.pth",
        "max_keypoints": 1000,
        "detection_threshold": 0.5,
        "sub_pixel": False,
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
        # the published detection_threshold (0.5) is a quantile-style gate
        # on normalised scores; our fused peakiness is unnormalised, so
        # gate at 0 and keep the score ordering (the top-k cut dominates)
        return apply(self.params, image, valid_wh,
                     max_keypoints=int(self.conf["max_keypoints"]),
                     threshold=0.0,
                     sub_pixel=bool(self.conf["sub_pixel"]))
