"""XFeat dense (star) matching pipeline.

Reference contract: imcui/hloc/matchers/xfeat_dense.py:8 — the upstream
``match_xfeat_star`` mode: dense XFeat features on both images, coarse
mutual matching, subpixel refinement. Standalone dense matcher
{image0, image1} → matched correspondences.

Implementation: XFeat extraction (models/extractors/xfeat.py) at a high
keypoint budget on both images + on-device mutual-NN with ratio test over
the 64-d descriptors; the refinement MLP is future work (conversion
pending with the upstream weights anyway).
"""

import jax.numpy as jnp

from ...ops.matching import mutual_nn_match
from ...utils.base_model import BaseModel


class XFeatDense(BaseModel):
    default_conf = {
        "max_keypoints": 8000,
        "ratio_threshold": 0.95,
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        from ..extractors.xfeat import XFeat

        self.extractor = XFeat({
            "max_keypoints": conf["max_keypoints"],
            "keypoint_threshold": 1e-5,
        })
        self.meta = dict(self.extractor.meta)

    def _forward(self, data):
        import jax

        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)
        f0 = self.extractor({"image": image0})
        f1 = self.extractor({"image": image1})

        def per_pair(d0, d1, m0, m1, k0, k1):
            nn = mutual_nn_match(
                d0.T, d1.T, mask0=m0, mask1=m1,
                ratio_thresh=self.conf["ratio_threshold"],
            )
            matched = nn["matches0"] > -1
            idx = jnp.clip(nn["matches0"], 0, k1.shape[0] - 1)
            return {
                "keypoints0": jnp.where(matched[:, None], k0, 0.0),
                "keypoints1": jnp.where(matched[:, None],
                                        jnp.take(k1, idx, axis=0), 0.0),
                "scores": nn["matching_scores0"],
                "mask": matched,
            }

        out = jax.vmap(per_pair)(
            f0["descriptors"], f1["descriptors"], f0["mask"], f1["mask"],
            f0["keypoints"], f1["keypoints"],
        )
        out["mconf"] = out["scores"]
        return out
