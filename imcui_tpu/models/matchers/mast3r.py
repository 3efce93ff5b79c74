"""MASt3R pointmap + descriptor matcher (reference contract:
imcui/hloc/matchers/mast3r.py:24-96 — subclasses Duster, adds the
local-descriptor head and matches with fast reciprocal NNs on the
descriptors instead of the raw 3-D points).

Built on the same ViT encoder/dual-decoder as duster.py. The descriptor
head mirrors the published Cat_MLP_LocalFeatures_DPT_Pts3d: an MLP over
cat(encoder token, final decoder token) emitting (desc_dim+1)·patch²
per patch, pixel-shuffled to a full-res 24-d local-feature map plus a
descriptor confidence channel. Matching = mutual NN over a subsampled
descriptor grid, on device (the wrapper's fast_reciprocal_NNs analog;
dense (N0, N1) similarity instead of its iterative block search).
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.weights import load_params_auto
from ..layers import apply_precision, gelu, init_linear, linear, vmap_pairs
from . import duster as duster_mod
from .duster import Duster

DESC_DIM = 24


def init_desc_head(rng, enc_dim, dec_dim, patch, desc_dim=DESC_DIM,
                   hidden_factor=4):
    """head_local_features MLP (upstream mast3r catmlpdpt head):
    in = enc_dim + dec_dim, hidden = 4·in, out = (desc_dim+1)·patch²."""
    k1, k2 = jax.random.split(rng)
    idim = enc_dim + dec_dim
    return {
        "fc1": init_linear(k1, idim, hidden_factor * idim),
        "fc2": init_linear(k2, hidden_factor * idim,
                           (desc_dim + 1) * patch ** 2),
    }


def desc_head_apply(p, enc_tokens, dec_tokens, grid, patch,
                    desc_dim=DESC_DIM):
    """→ full-res L2-normalised descriptor map (H, W, D) + desc-conf
    (H, W) (conf activation 1+exp, the mast3r reg_dense_conf 'exp')."""
    x = jnp.concatenate([enc_tokens, dec_tokens], -1)
    x = linear(p["fc2"], gelu(linear(p["fc1"], x)))
    hp, wp = grid
    # torch pixel_shuffle layout: channel-major then (dy, dx)
    x = x.reshape(hp, wp, desc_dim + 1, patch, patch)
    x = x.transpose(0, 3, 1, 4, 2).reshape(
        hp * patch, wp * patch, desc_dim + 1)
    desc = x[..., :desc_dim].astype(jnp.float32)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    conf = 1.0 + jnp.exp(x[..., desc_dim].astype(jnp.float32))
    return desc, conf


def reciprocal_nn_desc(desc0, desc1, conf0, conf1, coords,
                       max_matches=2048):
    """Mutual NN on per-cell descriptors (MASt3R's fast_reciprocal_NNs
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
    h0, h1 = duster_mod.decode(params, t0, t1, grid, conf)
    desc0, dconf0 = desc_head_apply(
        params["downstream_head1"]["head_local_features"], h0[0], h0[-1],
        grid, conf["patch"], conf["desc_dim"])
    desc1, dconf1 = desc_head_apply(
        params["downstream_head2"]["head_local_features"], h1[0], h1[-1],
        grid, conf["patch"], conf["desc_dim"])
    s = conf["subsample"]
    h, w = desc0.shape[:2]
    gy, gx = jnp.meshgrid(jnp.arange(0, h, s), jnp.arange(0, w, s),
                          indexing="ij")
    coords = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)
    k0, k1, score, valid = reciprocal_nn_desc(
        desc0[gy, gx].reshape(-1, conf["desc_dim"]),
        desc1[gy, gx].reshape(-1, conf["desc_dim"]),
        dconf0[gy, gx].reshape(-1), dconf1[gy, gx].reshape(-1),
        coords, max_matches=conf["max_matches"],
    )
    return {"keypoints0": k0, "keypoints1": k1, "scores": score,
            "mask": valid}


@functools.partial(jax.jit, static_argnames=("conf_key",))
def _apply_batched(params, image0, image1, conf_key):
    conf = dict(conf_key)
    return vmap_pairs(
        lambda a, b: forward_pair(params, a, b, conf)
    )(image0, image1)


def load_params(conf):
    """Duster tree + the two head_local_features MLPs, converted from the
    published metric checkpoint (same file the reference serves)."""
    init = duster_mod.init_params(jax.random.PRNGKey(0), conf)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    for key, k in (("downstream_head1", k1), ("downstream_head2", k2)):
        init[key]["head_local_features"] = init_desc_head(
            k, conf["enc_dim"], conf["dec_dim"], conf["patch"],
            conf.get("desc_dim", DESC_DIM))
    return load_params_auto(
        "mast3r/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth",
        init, "mast3r",
        drop=(r"^mask_token", r"pos_embed$"),
    )


class Mast3r(Duster):
    """Reference contract: imcui/hloc/matchers/mast3r.py:24-96."""

    default_conf = {
        **Duster.default_conf,
        "weights": "mast3r_vit_large",
        "desc_dim": DESC_DIM,
    }

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        self.params = apply_precision(
            self.params, conf.get("precision"),
            conv_min_ch=conf.get("int8_conv_min_ch"))
        self._conf_key = tuple(sorted(
            {k: conf[k] for k in
             ("enc_dim", "enc_depth", "enc_heads", "dec_dim", "dec_depth",
              "dec_heads", "patch", "max_matches", "subsample",
              "pos_embed", "head_type", "desc_dim")}.items()
        ))

    def _forward(self, data):
        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)

        def prep(img):
            if img.shape[1] == 1:
                img = jnp.tile(img, (1, 3, 1, 1))
            x = (img.transpose(0, 2, 3, 1) - 0.5) / 0.5
            if self.conf.get("precision") in ("bf16", "int8"):
                x = x.astype(jnp.bfloat16)
            return x

        out = _apply_batched(self.params, prep(image0), prep(image1),
                             self._conf_key)
        out["mconf"] = out["scores"]
        return out
