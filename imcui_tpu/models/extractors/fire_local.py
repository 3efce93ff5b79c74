"""FIRe local super-feature extractor, native JAX.

Reference contract: imcui/hloc/extractors/fire_local.py:21-100 — same FIRe
network as extractors/fire.py but returning ``forward_local``: the per-
scale super-features themselves (up to features_num), used for ASMK-style
local aggregation retrieval. Output key: {"local_descriptor"}.

The trunk + LIT attention live in .fire; this module selects the top
features_num super-features across scales by attention mass.
"""

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from .fire import (IMAGENET_MEAN, IMAGENET_STD, load_params, superfeatures,
                   trunk)


@jax.jit
def apply_local(params, image):
    x = image.transpose(0, 2, 3, 1)
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return superfeatures(params, trunk(params, x))


class FIReLocal(BaseModel):
    """Reference contract: imcui/hloc/extractors/fire_local.py:21."""

    default_conf = {
        "global": True,
        "asmk": False,
        "model_name": "fire_SfM_120k.pth",
        "scales": [2.0, 1.414, 1.0, 0.707, 0.5, 0.353, 0.25],
        "features_num": 1000,
        "asmk_name": "asmk_codebook.bin",
        "config_name": "eval_fire.yml",
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        self.scales = [s for s in conf["scales"] if 0.5 <= s <= 1.5]
        self.features_num = int(conf["features_num"])

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))
        b, _, h, w = image.shape
        feats, masses = [], []
        for s in self.scales:
            hs = max(32, int(round(h * s / 32)) * 32)
            ws = max(32, int(round(w * s / 32)) * 32)
            xi = jax.image.resize(image, (b, 3, hs, ws), "bilinear")
            sf, mass = apply_local(self.params, xi)
            feats.append(sf)
            masses.append(mass)
        sf = jnp.concatenate(feats, 1)    # (B, S·K, D)
        mass = jnp.concatenate(masses, 1)
        k = min(self.features_num, sf.shape[1])
        _, idx = jax.lax.top_k(mass, k)
        sel = jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(sf, idx)
        return {"local_descriptor": sel}
