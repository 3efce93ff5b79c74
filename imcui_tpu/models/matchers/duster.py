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
from ...utils.weights import load_params_auto
from ..backbones import dpt, vit
from ..layers import apply_precision, init_linear, linear, vmap_pairs

PUBLISHED = {
    "enc_dim": 1024, "enc_depth": 24, "enc_heads": 16,
    "dec_dim": 768, "dec_depth": 12, "dec_heads": 12,
    "patch": 16,
    # the released DUSt3R checkpoints use RoPE(100) positions and the
    # DPT pointmap head (512_dpt variant the reference serves)
    "pos_embed": "RoPE100",
    "head_type": "dpt",
}


def _hook_idx(dec_depth):
    """DUSt3R DPT hook depths over [enc_out, dec_1..dec_N]:
    [0, 2N/4, 3N/4, N]."""
    return (0, dec_depth * 2 // 4, dec_depth * 3 // 4, dec_depth)


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
    }
    if c.get("head_type", "dpt") == "dpt":
        dims = (c["enc_dim"], c["dec_dim"], c["dec_dim"], c["dec_dim"])
        params["downstream_head1"] = {
            "dpt": dpt.init_dpt(keys[next(ki)], dim_tokens=dims)}
        params["downstream_head2"] = {
            "dpt": dpt.init_dpt(keys[next(ki)], dim_tokens=dims)}
    else:  # linear pointmap head (224_linear variants, tiny test configs)
        params["downstream_head1"] = {"proj": init_linear(
            keys[next(ki)], c["dec_dim"], c["patch"] ** 2 * 4)}
        params["downstream_head2"] = {"proj": init_linear(
            keys[next(ki)], c["dec_dim"], c["patch"] ** 2 * 4)}
    return params


def load_params(conf, filename="duster/duster_vit_large.pth"):
    """Convert the upstream AsymmetricCroCo3DStereo checkpoint — the
    param tree mirrors its module names 1:1 (reference loads the same
    file: imcui/hloc/matchers/duster.py:33-38); mask_token and the raw
    pos-embed buffers are pretraining leftovers we drop."""
    init = init_params(jax.random.PRNGKey(0), conf)
    return load_params_auto(
        filename, init, "duster",
        drop=(r"^mask_token", r"pos_embed$", r"^prediction_head"),
    )


def encode(params, image, conf):
    """image: (H, W, 3) → tokens + grid shape."""
    tokens, (hp, wp) = vit.patch_embed_apply(
        params["patch_embed"], image, conf["patch"])
    rope = 100.0 if conf.get("pos_embed", "RoPE100") == "RoPE100" else None
    pos = vit.grid_positions(hp, wp) if rope else None
    if rope is None:
        tokens = tokens + vit.sincos_pos_embed(hp, wp, tokens.shape[-1])

    def step(t, blk):
        return vit.encoder_block_apply(blk, t, conf["enc_heads"],
                                       pos=pos, rope_base=rope), None

    if conf.get("remat"):  # trade FLOPs for HBM on the ViT-L encoder
        step = jax.checkpoint(step)
    # lax.scan over stacked blocks: one block body in the HLO instead of
    # enc_depth copies (the unrolled ViT-L graph broke the axon
    # remote-compile transport and costs minutes of XLA time)
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *params["enc_blocks"])
    tokens, _ = jax.lax.scan(step, tokens, stacked)
    return vit.layer_norm(params["enc_norm"], tokens), (hp, wp)


def decode(params, t0, t1, grid, conf):
    """Dual decoder with cross-attention between views. Returns the
    DUSt3R head hooks for both views: [enc_out, dec_i, dec_j, dec_last]
    with dec_norm applied to the final one."""
    rope = 100.0 if conf.get("pos_embed", "RoPE100") == "RoPE100" else None
    pos = vit.grid_positions(*grid) if rope else None
    d0 = linear(params["decoder_embed"], t0)
    d1 = linear(params["decoder_embed"], t1)
    outs0, outs1 = [t0], [t1]

    def step(carry, blks):
        b0, b1 = blks
        d0, d1 = carry
        d0n = vit.decoder_block_apply(b0, d0, d1, conf["dec_heads"],
                                      pos=pos, kpos=pos, rope_base=rope)
        d1n = vit.decoder_block_apply(b1, d1, d0, conf["dec_heads"],
                                      pos=pos, kpos=pos, rope_base=rope)
        return (d0n, d1n), (d0n, d1n)

    if conf.get("remat"):
        step = jax.checkpoint(step)
    s0 = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                *params["dec_blocks"])
    s1 = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                *params["dec_blocks2"])
    (_, _), (ys0, ys1) = jax.lax.scan(step, (d0, d1), (s0, s1))
    # hooks: ys holds layer outputs 1..N; index 0 is the encoder output
    idx = _hook_idx(conf["dec_depth"])
    outs0 = [t0] + [ys0[i - 1] for i in idx[1:]]
    outs1 = [t1] + [ys1[i - 1] for i in idx[1:]]
    outs0[-1] = vit.layer_norm(params["dec_norm"], outs0[-1])
    outs1[-1] = vit.layer_norm(params["dec_norm"], outs1[-1])
    return outs0, outs1


def _postprocess(out):
    """DUSt3R regression transforms: pts3d 'exp' mode (direction ×
    expm1(norm)) + conf = 1 + exp (dust3r postprocess contract)."""
    xyz = out[..., :3].astype(jnp.float32)
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    pts = xyz / jnp.maximum(d, 1e-8) * jnp.expm1(d)
    conf = 1.0 + jnp.exp(out[..., 3].astype(jnp.float32))
    return pts, conf


def head_to_pointmap(head, hooks, grid, patch):
    """Head (dpt or linear) → pointmap (H, W, 3) + conf (H, W)."""
    hp, wp = grid
    if "dpt" in head:
        out = dpt.dpt_apply(head["dpt"], hooks, grid)
    else:
        out = linear(head["proj"], hooks[-1])  # (N, p²·4)
        # torch pixel_shuffle layout: channel-major then (dy, dx)
        out = out.reshape(hp, wp, 4, patch, patch)
        out = out.transpose(0, 3, 1, 4, 2).reshape(
            hp * patch, wp * patch, 4)
    return _postprocess(out)


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
    h0, h1 = decode(params, t0, t1, grid, conf)
    pts0, conf0 = head_to_pointmap(params["downstream_head1"], h0, grid,
                                   conf["patch"])
    pts1, conf1 = head_to_pointmap(params["downstream_head2"], h1, grid,
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
    return vmap_pairs(
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
        # serving precision: None/"f32", "bf16", or "int8" (W8A8 dynamic
        # quantisation of the wide ViT projections — layers.apply_precision)
        "precision": None,
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        self.params = apply_precision(
            self.params, conf.get("precision"),
            conv_min_ch=conf.get("int8_conv_min_ch"))
        self._conf_key = tuple(sorted(
            {k: conf[k] for k in
             ("enc_dim", "enc_depth", "enc_heads", "dec_dim", "dec_depth",
              "dec_heads", "patch", "max_matches", "subsample",
              "pos_embed", "head_type")}.items()
        ))

    def _forward(self, data):
        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)

        def prep(img):
            if img.shape[1] == 1:
                img = jnp.tile(img, (1, 3, 1, 1))
            x = img.transpose(0, 2, 3, 1)
            # DUSt3R normalisation: (x - 0.5) / 0.5
            x = (x - 0.5) / 0.5
            if self.conf.get("precision") in ("bf16", "int8"):
                x = x.astype(jnp.bfloat16)
            return x

        x0, x1 = prep(image0), prep(image1)
        out = _apply_batched(self.params, x0, x1, self._conf_key)
        out["mconf"] = out["scores"]
        return out
