"""TopicFM detector-free matcher (topic-modelled feature matching),
native JAX.

Reference contract: imcui/hloc/matchers/topicfm.py:18-60 — standalone
dense matcher {image0, image1} → {keypoints0, keypoints1, mconf} with
n_sampling_topics and a score-sorted max_keypoints cut. The published
design augments LoFTR-style coarse features with a latent TOPIC model: a
bank of learned topic embeddings; each coarse token infers a topic
distribution; attention is restricted to tokens of the same topics
(covisible structures cluster into shared topics, suppressing attention to
non-covisible regions).

TPU-first: instead of hard-sampling n topics and building dynamic token
subsets (data-dependent shapes), the topic gate is applied as a
*soft co-assignment mask*: cross-attention logits get + log(pᵀq) of the
two tokens' topic mixtures — mathematically the expectation of the
sampled-topic attention, and one extra (L, S) MXU matmul. Backbone, fine
stage, and dual-softmax reuse the LoFTR stack.
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import init_linear, layer_norm, linear, relu
from .loftr import (D_COARSE, backbone_apply, coarse_match, encoder_layer,
                    fine_match, gather_fine_windows,
                    init_params as init_loftr_params, position_encoding)

N_TOPICS = 100


def init_params(rng):
    keys = jax.random.split(rng, 4)
    base = init_loftr_params(keys[0], n_coarse_layers=4, n_fine_layers=2)
    return {
        **base,
        "topics": jax.random.normal(keys[1], (N_TOPICS, D_COARSE)) * 0.02,
        "topic_proj": init_linear(keys[2], D_COARSE, D_COARSE),
    }


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("topicfm/" + conf.get("model_name",
                                              "model_best.ckpt"), init, "topicfm")


def topic_mixture(params, feat):
    """(L, d) → (L, T) topic distribution."""
    logits = linear(params["topic_proj"], feat) @ params["topics"].T
    return jax.nn.softmax(logits / D_COARSE ** 0.5, -1)


def topic_cross_attention(layer, x, source, tx, tsrc, mask_src,
                          nhead=8):
    """Cross attention with the topic co-assignment gate:
    logits += log(⟨topic_x, topic_src⟩)."""
    n, d = x.shape
    dh = d // nhead
    q = linear(layer["q_proj"], x).reshape(n, nhead, dh)
    k = linear(layer["k_proj"], source).reshape(-1, nhead, dh)
    v = linear(layer["v_proj"], source).reshape(-1, nhead, dh)
    logits = jnp.einsum("nhd,mhd->hnm", q, k,
                        preferred_element_type=jnp.float32) / dh ** 0.5
    co = tx @ tsrc.T  # (L, S) topic co-assignment probability
    logits = logits + jnp.log(jnp.maximum(co, 1e-6))[None]
    logits = jnp.where(mask_src[None, None, :], logits, -1e9)
    attn = jax.nn.softmax(logits, -1)
    msg = jnp.einsum("hnm,mhd->nhd", attn, v.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    msg = linear(layer["merge"], msg.reshape(n, d).astype(x.dtype))
    msg = layer_norm(layer["norm1"], msg)
    msg = jnp.concatenate([x, msg], -1)
    msg = linear(layer["mlp"]["2"], relu(linear(layer["mlp"]["0"], msg)))
    return x + layer_norm(layer["norm2"], msg)


def forward_pair(params, image0, image1, wh0, wh1, conf):
    featc, featf = backbone_apply(params["backbone"],
                                  jnp.stack([image0, image1], 0))
    hc, wc = featc.shape[1:3]
    pe = position_encoding(hc, wc)
    fc0 = (featc[0] + pe).reshape(-1, D_COARSE)
    fc1 = (featc[1] + pe).reshape(-1, D_COARSE)

    def grid_mask(wh):
        ys = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
        return ((xs < wh[0] // 8) & (ys < wh[1] // 8)).reshape(-1)

    m0 = grid_mask(wh0)
    m1 = grid_mask(wh1)

    for i, layer in enumerate(params["loftr_coarse"]["layers"]):
        if i % 2 == 0:  # self: plain linear attention
            fc0 = encoder_layer(layer, fc0, fc0, mask_src=m0)
            fc1 = encoder_layer(layer, fc1, fc1, mask_src=m1)
        else:  # cross: topic-gated dense attention
            t0 = topic_mixture(params, fc0)
            t1 = topic_mixture(params, fc1)
            fc0n = topic_cross_attention(layer, fc0, fc1, t0, t1, m1)
            fc1 = topic_cross_attention(layer, fc1, fc0, t1, t0, m0)
            fc0 = fc0n

    idx0, idx1, score, valid = coarse_match(
        fc0, fc1, m0, m1, threshold=conf.get("match_threshold", 0.2),
        max_matches=conf.get("max_matches", 1024))

    win0 = gather_fine_windows(featf[0], idx0, wc)
    win1 = gather_fine_windows(featf[1], idx1, wc)
    down = params["fine_preprocess"]["down_proj"]
    merge = params["fine_preprocess"]["merge_feat"]
    c0 = linear(down, jnp.take(fc0, idx0, axis=0))
    c1 = linear(down, jnp.take(fc1, idx1, axis=0))
    win0 = linear(merge, jnp.concatenate(
        [win0, jnp.broadcast_to(c0[:, None], win0.shape)], -1))
    win1 = linear(merge, jnp.concatenate(
        [win1, jnp.broadcast_to(c1[:, None], win1.shape)], -1))
    offsets1 = fine_match(params, win0, win1, valid)

    def cell_center(idx):
        ci = (idx // wc).astype(jnp.float32)
        cj = (idx % wc).astype(jnp.float32)
        return jnp.stack([cj * 8 + 4, ci * 8 + 4], -1)

    kpts0 = jnp.where(valid[:, None], cell_center(idx0), 0.0)
    kpts1 = jnp.where(valid[:, None],
                      cell_center(idx1) + offsets1 * 2.0, 0.0)
    return {"keypoints0": kpts0, "keypoints1": kpts1, "scores": score,
            "mask": valid}


@functools.partial(jax.jit, static_argnames=("conf_key",))
def _apply_batched(params, image0, image1, wh0, wh1, conf_key):
    conf = dict(conf_key)
    return jax.vmap(
        lambda a, b, c, d: forward_pair(params, a, b, c, d, conf)
    )(image0, image1, wh0, wh1)


class TopicFM(BaseModel):
    """Reference contract: imcui/hloc/matchers/topicfm.py:18."""

    default_conf = {
        "weights": "outdoor",
        "model_name": "model_best.ckpt",
        "match_threshold": 0.2,
        "n_sampling_topics": 4,
        "max_keypoints": -1,
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        mm = conf.get("max_keypoints")
        self._conf_key = tuple(sorted({
            "match_threshold": float(conf["match_threshold"]),
            "max_matches": 2048 if mm in (-1, None) else int(mm),
        }.items()))

    def _forward(self, data):
        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)
        b = image0.shape[0]
        img0 = image0.transpose(0, 2, 3, 1)
        img1 = image1.transpose(0, 2, 3, 1)
        if img0.shape[-1] == 3:
            img0 = img0.mean(-1, keepdims=True)
            img1 = img1.mean(-1, keepdims=True)

        def wh(key, img):
            if key in data:
                return jnp.asarray(data[key], jnp.int32)
            h, w = img.shape[1:3]
            return jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))

        out = _apply_batched(self.params, img0, img1, wh("size0", img0),
                             wh("size1", img1), self._conf_key)
        out["mconf"] = out["scores"]
        return out
