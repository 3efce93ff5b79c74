"""Template extractor for contributors (reference contract:
imcui/hloc/extractors/example.py:17 — referenced by README as the
starting point for adding a model).

Shows the framework conventions: functional params + jitted apply, the
dict-in/dict-out BaseModel protocol, and fixed-shape masked outputs.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ..layers import conv2d, init_conv, relu


def init_params(rng):
    k1, k2 = jax.random.split(rng)
    return {
        "conv1": init_conv(k1, 3, 3, 1, 32),
        "score": init_conv(k2, 1, 1, 32, 1),
    }


@functools.partial(jax.jit, static_argnames=("max_keypoints",))
def apply(params, image, valid_wh, max_keypoints=512):
    x = image.transpose(0, 2, 3, 1)
    feat = relu(conv2d(params["conv1"], x))
    heat = jax.nn.sigmoid(conv2d(params["score"], feat))[..., 0]
    h, w = heat.shape[1:]

    def per_image(scores, fmap, vwh):
        s = nms_ops.simple_nms(scores, 2)
        s = s * nms_ops.border_mask(h, w, 2, valid_wh=vwh, dtype=s.dtype)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            s, max_keypoints, 0.0)
        ix = jnp.clip(kpts[:, 0].astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(kpts[:, 1].astype(jnp.int32), 0, h - 1)
        d = fmap[iy, ix]
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                            1e-8)
        return kpts, kscores, d.T, mask

    kpts, kscores, desc, mask = jax.vmap(per_image)(heat, feat, valid_wh)
    return {"keypoints": kpts, "scores": kscores, "descriptors": desc,
            "mask": mask}


class Example(BaseModel):
    # 1. declare your conf defaults — users override any subset
    default_conf = {
        "max_keypoints": 512,
        "model_name": "example_model.pth",
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        # 2. build (or convert) the param pytree
        self.params = init_params(rng)
        self.meta = {"pretrained": False}

    def _forward(self, data):
        # 3. fixed-shape masked outputs, (B, N, 2)/(B, N)/(B, D, N)
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 3:
            image = image.mean(1, keepdims=True)
        b, _, h, w = image.shape
        valid_wh = jnp.asarray(
            data.get("valid_wh",
                     jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))),
            jnp.int32,
        )
        return apply(self.params, image, valid_wh,
                     max_keypoints=self.conf["max_keypoints"])
