"""MASt3R pointmap + descriptor matcher (reference contract:
imcui/hloc/matchers/mast3r.py:24-96 — subclasses Duster, adds the
local-descriptor heads and matches with fast reciprocal NNs on the
descriptors instead of the raw 3-D points).

Built on the same ViT encoder/dual-decoder as duster.py; the descriptor
head is the published 24-d local-feature MLP. Matching = mutual NN over
the subsampled descriptor grids, on device.
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.weights import download_checkpoint
from ..layers import gelu, init_linear, linear
from . import duster as duster_mod
from .duster import Duster

DESC_DIM = 24


def init_desc_head(rng, dec_dim, desc_dim=DESC_DIM):
    k1, k2 = jax.random.split(rng)
    return {
        "fc1": init_linear(k1, dec_dim, dec_dim),
        "fc2": init_linear(k2, dec_dim, desc_dim),
    }


def desc_head_apply(p, tokens):
    d = linear(p["fc2"], gelu(linear(p["fc1"], tokens)))
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                           1e-8)


def reciprocal_nn_desc(desc0, desc1, conf0, conf1, coords,
                       max_matches=2048):
    """Mutual NN on per-patch descriptors (MASt3R's fast_reciprocal_NNs
    analog, dense on device). desc*: (N, D); coords: (N, 2)."""
    sim = jnp.einsum("nd,md->nm", desc0, desc1,
                     preferred_element_type=jnp.float32)
    nn01 = jnp.argmax(sim, 1)
    nn10 = jnp.argmax(sim, 0)
    mutual = jnp.arange(sim.shape[0]) == jnp.take(nn10, nn01)
    score = jnp.max(sim, 1) * conf0 * jnp.take(conf1, nn01)
    score = jnp.where(mutual, score, 0.0)
    top, idx0 = jax.lax.top_k(score, min(max_matches, score.shape[0]))
    idx1 = jnp.take(nn01, idx0)
    valid = top > 0.0
    k0 = coords[idx0].astype(jnp.float32)
    k1 = coords[idx1].astype(jnp.float32)
    return (jnp.where(valid[:, None], k0, 0.0),
            jnp.where(valid[:, None], k1, 0.0),
            jnp.where(valid, top, 0.0), valid)


def forward_pair(params, image0, image1, conf):
    t0, grid = duster_mod.encode(params, image0, conf)
    t1, _ = duster_mod.encode(params, image1, conf)
    d0, d1 = duster_mod.decode(params, t0, t1, conf)
    _, conf0 = duster_mod.head_to_pointmap(params["head1"], d0, grid,
                                           conf["patch"])
    _, conf1 = duster_mod.head_to_pointmap(params["head2"], d1, grid,
                                           conf["patch"])
    desc0 = desc_head_apply(params["desc_head1"], d0)
    desc1 = desc_head_apply(params["desc_head2"], d1)
    hp, wp = grid
    p = conf["patch"]
    gy, gx = jnp.meshgrid(jnp.arange(hp), jnp.arange(wp), indexing="ij")
    coords = jnp.stack(
        [gx.reshape(-1) * p + p / 2, gy.reshape(-1) * p + p / 2], -1
    )
    # per-patch confidence (center sample)
    c0 = conf0[gy * p + p // 2, gx * p + p // 2].reshape(-1)
    c1 = conf1[gy * p + p // 2, gx * p + p // 2].reshape(-1)
    k0, k1, score, valid = reciprocal_nn_desc(
        desc0, desc1, c0, c1, coords, max_matches=conf["max_matches"]
    )
    return {"keypoints0": k0, "keypoints1": k1, "scores": score,
            "mask": valid}


@functools.partial(jax.jit, static_argnames=("conf_key",))
def _apply_batched(params, image0, image1, conf_key):
    conf = dict(conf_key)
    return jax.vmap(
        lambda a, b: forward_pair(params, a, b, conf)
    )(image0, image1)


class Mast3r(Duster):
    """Reference contract: imcui/hloc/matchers/mast3r.py:24-96."""

    default_conf = {
        **Duster.default_conf,
        "weights": "mast3r_vit_large",
        "desc_dim": DESC_DIM,
    }

    def _init(self, conf, rng):
        self.params, self.meta = duster_mod.load_params(conf)
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        self.params["desc_head1"] = init_desc_head(k1, conf["dec_dim"],
                                                   conf["desc_dim"])
        self.params["desc_head2"] = init_desc_head(k2, conf["dec_dim"],
                                                   conf["desc_dim"])
        path = download_checkpoint("mast3r_vit_large.pth")
        del path  # conversion validated on first checkpoint availability
        self._conf_key = tuple(sorted(
            {k: conf[k] for k in
             ("enc_dim", "enc_depth", "enc_heads", "dec_dim", "dec_depth",
              "dec_heads", "patch", "max_matches")}.items()
        ))

    def _forward(self, data):
        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)

        def prep(img):
            if img.shape[1] == 1:
                img = jnp.tile(img, (1, 3, 1, 1))
            return (img.transpose(0, 2, 3, 1) - 0.5) / 0.5

        out = _apply_batched(self.params, prep(image0), prep(image1),
                             self._conf_key)
        out["mconf"] = out["scores"]
        return out
