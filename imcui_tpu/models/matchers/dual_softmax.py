"""Dual-softmax matcher.

Reference contract: imcui/hloc/matchers/dual_softmax.py:39-71 — conf
inv_temperature / match_threshold, output {matches0, matching_scores0,
similarity}. Compute lives in ops/matching.py.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops.matching import dual_softmax_match
from ...utils.base_model import BaseModel


@functools.partial(
    jax.jit, static_argnames=("inv_temperature", "match_threshold")
)
def apply(desc0, desc1, mask0, mask1, inv_temperature=20.0,
          match_threshold=0.2):
    def per_pair(d0, d1, m0, m1):
        return dual_softmax_match(
            d0.T, d1.T, mask0=m0, mask1=m1,
            inv_temperature=inv_temperature,
            match_threshold=match_threshold,
        )

    return jax.vmap(per_pair)(desc0, desc1, mask0, mask1)


class DualSoftMax(BaseModel):
    default_conf = {
        "match_threshold": 0.2,
        "inv_temperature": 20,
    }
    required_inputs = ["descriptors0", "descriptors1"]

    def _init(self, conf, rng):
        self.meta = {"pretrained": True}  # parameter-free

    def _forward(self, data):
        desc0 = jnp.asarray(data["descriptors0"], jnp.float32)
        desc1 = jnp.asarray(data["descriptors1"], jnp.float32)
        b, _, n0 = desc0.shape
        n1 = desc1.shape[2]
        mask0 = jnp.asarray(data.get("mask0", jnp.ones((b, n0), bool)), bool)
        mask1 = jnp.asarray(data.get("mask1", jnp.ones((b, n1), bool)), bool)
        return apply(
            desc0, desc1, mask0, mask1,
            inv_temperature=float(self.conf["inv_temperature"]),
            match_threshold=float(self.conf["match_threshold"]),
        )
