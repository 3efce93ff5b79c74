"""XFeat + LightGlue standalone pipeline (reference contract:
imcui/hloc/matchers/xfeat_lightglue.py:8-45 — xfeat detection feeding the
"lighterglue" matcher). Composition of the framework's XFeat extractor and
LightGlue with 64-d input features."""

import jax.numpy as jnp

from ...utils.base_model import BaseModel


class XFeatLightGlue(BaseModel):
    default_conf = {
        "max_keypoints": 4096,
        "match_threshold": 0.1,
        "n_layers": 6,  # the published lighterglue is shallower
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        from ..extractors.xfeat import XFeat
        from .lightglue import LightGlue

        self.extractor = XFeat({
            "max_keypoints": conf["max_keypoints"],
            "keypoint_threshold": 1e-5,
        })
        self.matcher = LightGlue({
            "features": "xfeat",
            "n_layers": conf["n_layers"],
            "match_threshold": conf["match_threshold"],
            "model_name": "xfeat_lighterglue.pth",
        })
        self.meta = {
            "pretrained": self.extractor.meta.get("pretrained", False)
            and self.matcher.meta.get("pretrained", False)
        }

    def _forward(self, data):
        import jax

        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)
        f0 = self.extractor({"image": image0})
        f1 = self.extractor({"image": image1})
        b = image0.shape[0]
        size = lambda img: jnp.tile(  # noqa: E731
            jnp.asarray([[img.shape[3], img.shape[2]]], jnp.float32),
            (b, 1))
        matched = self.matcher({
            "keypoints0": f0["keypoints"],
            "keypoints1": f1["keypoints"],
            "descriptors0": f0["descriptors"],
            "descriptors1": f1["descriptors"],
            "mask0": f0["mask"], "mask1": f1["mask"],
            "size0": size(image0), "size1": size(image1),
        })
        m0 = matched["matches0"]
        ok = m0 > -1
        idx = jnp.clip(m0, 0, f1["keypoints"].shape[1] - 1)

        def gather(k1, i):
            return jnp.take(k1, i, axis=0)

        k1m = jax.vmap(gather)(f1["keypoints"], idx)
        return {
            "keypoints0": jnp.where(ok[..., None], f0["keypoints"], 0.0),
            "keypoints1": jnp.where(ok[..., None], k1m, 0.0),
            "scores": matched["matching_scores0"],
            "mconf": matched["matching_scores0"],
            "mask": ok,
        }
