"""RDD dense matcher (semi-dense matching on RDD features), native JAX.

Reference contract: imcui/hloc/matchers/rdd_dense.py:16-53 — standalone
dense matcher {image0, image1} → {keypoints0, keypoints1, mconf} via
RDD_helper.match_dense(thr): the RDD backbone's dense /8 descriptors are
matched by a dual-softmax with mutual-NN decoding, keypoints refined by
the detection map's soft-argmax.

Reuses the RDD extractor backbone (models/extractors/rdd.py — CNN pyramid
+ deformable-attention encoder); the matching stage is the shared
fixed-M coarse assignment (models/matchers/loftr.coarse_match).
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ..extractors.rdd import backbone as rdd_backbone, load_params
from .loftr import coarse_match


@functools.partial(jax.jit,
                   static_argnames=("max_matches", "threshold"))
def _apply_batched(params, image0, image1, wh0, wh1, max_matches=2048,
                   threshold=0.1):
    def per_pair(a, b, wh0_, wh1_):
        score_a, desc_a = rdd_backbone(params, a[None])
        score_b, desc_b = rdd_backbone(params, b[None])
        hc, wc = desc_a.shape[1:3]
        f0 = desc_a[0].reshape(-1, desc_a.shape[-1])
        f1 = desc_b[0].reshape(-1, desc_b.shape[-1])

        def grid_mask(wh):
            ys = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
            xs = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
            return ((xs < wh[0] // 8) & (ys < wh[1] // 8)).reshape(-1)

        m0 = grid_mask(wh0_)
        m1 = grid_mask(wh1_)
        idx0, idx1, conf, valid = coarse_match(
            f0, f1, m0, m1, threshold=threshold,
            max_matches=max_matches)

        def to_px(idx, smap):
            ci = (idx // wc).astype(jnp.float32)
            cj = (idx % wc).astype(jnp.float32)
            return jnp.stack([cj * 8 + 4, ci * 8 + 4], -1)

        k0 = jnp.where(valid[:, None], to_px(idx0, score_a[0]), 0.0)
        k1 = jnp.where(valid[:, None], to_px(idx1, score_b[0]), 0.0)
        return {"keypoints0": k0, "keypoints1": k1, "scores": conf,
                "mask": valid}

    return jax.vmap(per_pair)(image0, image1, wh0, wh1)


class RddDense(BaseModel):
    """Reference contract: imcui/hloc/matchers/rdd_dense.py:16."""

    default_conf = {
        "keypoint_threshold": 0.1,
        "max_keypoints": 4096,
        "model_name": "RDD-v2.pth",
        "match_threshold": 0.1,
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)

    def _forward(self, data):
        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)
        b = image0.shape[0]

        def prep(img):
            x = img.transpose(0, 2, 3, 1)
            if x.shape[-1] == 1:
                x = jnp.tile(x, (1, 1, 1, 3))
            return x

        def wh(key, img):
            if key in data:
                return jnp.asarray(data[key], jnp.int32)
            h, w = img.shape[-2:]
            return jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))

        out = _apply_batched(
            self.params, prep(image0), prep(image1),
            wh("size0", image0), wh("size1", image1),
            max_matches=int(self.conf["max_keypoints"]),
            threshold=float(self.conf["match_threshold"]))
        out["mconf"] = out["scores"]
        return out
