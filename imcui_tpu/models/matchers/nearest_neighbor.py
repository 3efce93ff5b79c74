"""Nearest-neighbor descriptor matcher.

Reference contract: imcui/hloc/matchers/nearest_neighbor.py:27-66 — conf
flags ratio_threshold / distance_threshold / do_mutual_check, input
{descriptors0, descriptors1} (B, D, N), output {matches0, matching_scores0}.
The compute is the masked MXU einsum + top-2 path in ops/matching.py.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops.matching import mutual_nn_match
from ...utils.base_model import BaseModel


@functools.partial(
    jax.jit,
    static_argnames=("ratio_threshold", "distance_threshold", "do_mutual_check"),
)
def apply(desc0, desc1, mask0, mask1, ratio_threshold=None,
          distance_threshold=None, do_mutual_check=True):
    def per_pair(d0, d1, m0, m1):
        return mutual_nn_match(
            d0.T, d1.T, mask0=m0, mask1=m1,
            ratio_thresh=ratio_threshold,
            distance_thresh=distance_threshold,
            do_mutual_check=do_mutual_check,
        )

    return jax.vmap(per_pair)(desc0, desc1, mask0, mask1)


class NearestNeighbor(BaseModel):
    default_conf = {
        "ratio_threshold": None,
        "distance_threshold": None,
        "do_mutual_check": True,
    }
    required_inputs = ["descriptors0", "descriptors1"]

    def _init(self, conf, rng):
        self.meta = {"pretrained": True}  # parameter-free

    def _forward(self, data):
        desc0 = jnp.asarray(data["descriptors0"], jnp.float32)
        desc1 = jnp.asarray(data["descriptors1"], jnp.float32)
        b, _, n0 = desc0.shape
        n1 = desc1.shape[2]
        mask0 = jnp.asarray(
            data.get("mask0", jnp.ones((b, n0), bool)), bool)
        mask1 = jnp.asarray(
            data.get("mask1", jnp.ones((b, n1), bool)), bool)
        return apply(
            desc0, desc1, mask0, mask1,
            ratio_threshold=self.conf["ratio_threshold"],
            distance_threshold=self.conf["distance_threshold"],
            do_mutual_check=self.conf["do_mutual_check"],
        )
