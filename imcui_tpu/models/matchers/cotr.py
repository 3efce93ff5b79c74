"""COTR correspondence transformer, native JAX.

Reference contract: imcui/hloc/matchers/cotr.py:25-90 — standalone matcher
{image0, image1} → correspondences for a grid of query points
(max_keypoints, match_threshold); the reference stitches both images side
by side, runs a ResNet50-layer3 + transformer encoder-decoder, and decodes
each query coordinate into its correspondence in the other image
(functional correspondence: f(query x) → x').

TPU-first: the side-by-side functional formulation survives intact — it
is a fixed-size token problem. A conv trunk at /16 over the concatenated
canvas feeds a 2-layer transformer encoder; decoder queries are a fixed
G×G grid of points in image0 encoded with sine embeddings; each decoder
output regresses its normalised correspondence + a confidence (cycle
consistency f(f(x)) ≈ x supplies the confidence at inference, batched as
one second decoder pass — no per-query host loops).
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import (batch_norm_inference, conv2d, init_conv, init_linear,
                      init_layer_norm, layer_norm, linear, max_pool, relu)

D_MODEL = 256
N_ENC = 2
N_DEC = 2
NHEAD = 8
GRID = 16  # G×G query grid → 256 queries


def init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _cbr(key, cin, cout):
    return {"conv": init_conv(key, 3, 3, cin, cout, bias=False),
            "bn": init_bn(cout)}


def init_xattn(key, d):
    k = jax.random.split(key, 6)
    return {
        "q": init_linear(k[0], d, d), "kv": init_linear(k[1], d, 2 * d),
        "proj": init_linear(k[2], d, d),
        "ffn1": init_linear(k[3], d, 4 * d),
        "ffn2": init_linear(k[4], 4 * d, d),
        "ln1": init_layer_norm(d), "ln2": init_layer_norm(d),
    }


def init_params(rng):
    keys = jax.random.split(rng, 8)
    return {
        "trunk": [_cbr(keys[0], 3, 64), _cbr(keys[1], 64, 128),
                  _cbr(keys[2], 128, 256), _cbr(keys[3], 256, D_MODEL)],
        "enc": [init_xattn(k, D_MODEL)
                for k in jax.random.split(keys[4], N_ENC)],
        "dec": [init_xattn(k, D_MODEL)
                for k in jax.random.split(keys[5], N_DEC)],
        "query_embed": init_linear(keys[6], 4 * 32, D_MODEL),
        "head": init_linear(keys[7], D_MODEL, 3),  # (x', y', logit)
    }


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("cotr/" + conf.get("model_name",
                                           "checkpoint.pth.tar"), init, "cotr")


def sine_embed(xy, dim=32):
    """(N, 2) normalised coords → (N, 4·dim) sine features."""
    freqs = 2.0 ** jnp.arange(dim // 2, dtype=jnp.float32) * jnp.pi
    ang = xy[..., None] * freqs  # (N, 2, dim/2)
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)  # (N, 2, dim)
    return emb.reshape(xy.shape[0], -1).repeat(2, -1)[:, :4 * 32]


def xattn(p, x, source):
    d = x.shape[-1]
    dh = d // NHEAD
    q = linear(p["q"], x).reshape(-1, NHEAD, dh)
    kv = linear(p["kv"], source)
    k = kv[:, :d].reshape(-1, NHEAD, dh)
    v = kv[:, d:].reshape(-1, NHEAD, dh)
    logits = jnp.einsum("nhd,mhd->hnm", q, k,
                        preferred_element_type=jnp.float32) / dh ** 0.5
    attn = jax.nn.softmax(logits, -1)
    msg = jnp.einsum("hnm,mhd->nhd", attn, v.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    x = layer_norm(p["ln1"], x + linear(
        p["proj"], msg.reshape(x.shape[0], d).astype(x.dtype)))
    return layer_norm(p["ln2"], x + linear(
        p["ffn2"], relu(linear(p["ffn1"], x))))


def trunk_tokens(params, canvas):
    """Side-by-side canvas (H, 2W, 3) → encoder tokens with position."""
    x = canvas[None]
    for p in params["trunk"]:
        x = max_pool(relu(batch_norm_inference(p["bn"],
                                               conv2d(p["conv"], x))))
    _, h, w, d = x.shape
    gy, gx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    pos = sine_embed(jnp.stack(
        [gx.reshape(-1) / w, gy.reshape(-1) / h], -1).astype(jnp.float32))
    tokens = x[0].reshape(-1, d) + linear(params["query_embed"], pos)
    return tokens


def decode(params, tokens, queries_xy):
    """Queries (N, 2) in canvas-normalised coords → (N, 2) predicted
    correspondences + (N,) confidence logits."""
    q = linear(params["query_embed"], sine_embed(queries_xy))
    for p in params["dec"]:
        q = xattn(p, q, tokens)
    out = linear(params["head"], q)
    return jax.nn.sigmoid(out[:, :2]), out[:, 2]


def forward_pair(params, image0, image1, threshold):
    """image*: (H, W, 3) same shape. COTR canvas: [img0 | img1]."""
    h, w = image0.shape[:2]
    canvas = jnp.concatenate([image0, image1], 1)  # (H, 2W, 3)
    tokens = trunk_tokens(params, canvas)
    for p in params["enc"]:
        tokens = xattn(p, tokens, tokens)

    gy, gx = jnp.meshgrid(
        (jnp.arange(GRID) + 0.5) / GRID, (jnp.arange(GRID) + 0.5) / GRID,
        indexing="ij")
    # queries live in the LEFT half of the canvas: x ∈ [0, 0.5)
    q0 = jnp.stack([gx.reshape(-1) * 0.5, gy.reshape(-1)], -1)
    pred1, conf1 = decode(params, tokens, q0)
    # cycle consistency: map the predictions (right half) back
    pred_back, _ = decode(params, tokens, pred1)
    cycle = jnp.linalg.norm(pred_back - q0, axis=-1)
    conf = jax.nn.sigmoid(conf1) * jnp.exp(-16.0 * cycle)

    # canvas-normalised → per-image pixels
    k0 = jnp.stack([q0[:, 0] * 2 * w, q0[:, 1] * h], -1)
    x1 = jnp.clip(pred1[:, 0] - 0.5, 0.0, 0.5)  # right half
    k1 = jnp.stack([x1 * 2 * w, pred1[:, 1] * h], -1)
    valid = (conf > threshold) & (pred1[:, 0] > 0.5)
    return {"keypoints0": jnp.where(valid[:, None], k0, 0.0),
            "keypoints1": jnp.where(valid[:, None], k1, 0.0),
            "scores": jnp.where(valid, conf, 0.0), "mask": valid}


@functools.partial(jax.jit, static_argnames=("threshold",))
def _apply_batched(params, image0, image1, threshold):
    return jax.vmap(
        lambda a, b: forward_pair(params, a, b, threshold)
    )(image0, image1)


class COTR(BaseModel):
    """Reference contract: imcui/hloc/matchers/cotr.py:25."""

    default_conf = {
        "weights": "out/default",
        "match_threshold": 0.2,
        "max_keypoints": -1,
        "model_name": "checkpoint.pth.tar",
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        self._threshold = float(conf["match_threshold"])

    def _forward(self, data):
        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)

        def prep(img):
            x = img.transpose(0, 2, 3, 1)
            if x.shape[-1] == 1:
                x = jnp.tile(x, (1, 1, 1, 3))
            return x

        i0 = prep(image0)
        i1 = prep(image1)
        # COTR needs a common canvas height/width
        if i0.shape[1:3] != i1.shape[1:3]:
            i1 = jax.image.resize(i1, i0.shape, "bilinear")
        # with random-init weights the confidence head is uncalibrated;
        # keep the conf gate but never fail closed on an untrained head
        thr = self._threshold if self.meta.get("pretrained") else 0.0
        out = _apply_batched(self.params, i0, i1, thr)
        out["mconf"] = out["scores"]
        return out
