"""COTR correspondence transformer, native JAX.

Reference contract: imcui/hloc/matchers/cotr.py:25-90 — standalone matcher
{image0, image1} → correspondences for a grid of query points
(max_keypoints, match_threshold); the reference stitches both images side
by side and decodes each query coordinate into its correspondence
(functional correspondence: f(query x) → x').

The network is the published COTR model (ubc-vision/COTR
cotr_model.py — a DETR-derived encoder/decoder), keyed to the
``checkpoint.pth.tar`` state_dict naming and pinned by the torch
restatement fixture in tests/test_torch_parity3.py:

- ``backbone.0.body``: torchvision ResNet50 (frozen BN) through layer3
  → 1024-ch stride-16 features over the stitched 256×512 canvas;
- ``input_proj``: 1×1 conv 1024 → 256;
- positions: NerfPositionalEncoding('lin_sine', depth 64) — interleaved
  cat([sin(kπx), sin(kπy)]_{k=1..64} ++ [cos(kπx), cos(kπy)]_{k=1..64})
  of the (x+0.5)/W, (y+0.5)/H feature-grid coords (PositionEmbeddingNeRF
  cumsum convention); queries use the SAME encoding on their [0,1]²
  canvas coords (query_proj has no learned params);
- ``transformer``: DETR post-norm, 6 encoder + 6 decoder layers, d=256,
  8 heads, FFN 1024, ReLU; fused-qkv nn.MultiheadAttention layouts
  (in_proj/out_proj); decoder ends with ``decoder.norm``;
- ``corr_embed``: 3-layer MLP 256 → 256 → 256 → 2 regressing the
  canvas-normalised correspondence.

TPU-first inference: the reference's recursive zoom-in SparseEngine is
replaced by one fixed-size pass — a G×G query grid over the left half
plus a second batched decoder pass for cycle-consistency confidence
(f(f(x)) ≈ x), no per-query host loops, static shapes throughout.
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..backbones.resnet import init_resnet
from ..layers import (conv2d, init_conv, init_layer_norm, init_linear,
                      layer_norm, linear, relu)

D_MODEL = 256
N_ENC = 6
N_DEC = 6
NHEAD = 8
D_FFN = 1024
NERF_DEPTH = 64  # hidden_dim // 4
GRID = 16        # G×G query grid → 256 queries
SIZE = 256       # per-image canvas tile (COTR inference resolution)

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def init_mha(key, d):
    k1, k2 = jax.random.split(key)
    return {
        "in_proj": init_linear(k1, d, 3 * d),
        "out_proj": init_linear(k2, d, d),
    }


def init_enc_layer(key, d):
    k = jax.random.split(key, 3)
    return {
        "self_attn": init_mha(k[0], d),
        "linear1": init_linear(k[1], d, D_FFN),
        "linear2": init_linear(k[2], D_FFN, d),
        "norm1": init_layer_norm(d),
        "norm2": init_layer_norm(d),
    }


def init_dec_layer(key, d):
    k = jax.random.split(key, 4)
    return {
        "self_attn": init_mha(k[0], d),
        "multihead_attn": init_mha(k[1], d),
        "linear1": init_linear(k[2], d, D_FFN),
        "linear2": init_linear(k[3], D_FFN, d),
        "norm1": init_layer_norm(d),
        "norm2": init_layer_norm(d),
        "norm3": init_layer_norm(d),
    }


def init_params(rng):
    keys = jax.random.split(rng, 8)
    return {
        "backbone": init_resnet(keys[0], "resnet50"),
        "input_proj": init_conv(keys[1], 1, 1, 1024, D_MODEL),
        "transformer": {
            "encoder": {"layers": {
                str(i): init_enc_layer(k, D_MODEL)
                for i, k in enumerate(jax.random.split(keys[2], N_ENC))
            }},
            "decoder": {
                "layers": {
                    str(i): init_dec_layer(k, D_MODEL)
                    for i, k in enumerate(jax.random.split(keys[3],
                                                           N_DEC))
                },
                "norm": init_layer_norm(D_MODEL),
            },
        },
        "corr_embed": {"layers": {
            "0": init_linear(keys[4], D_MODEL, D_MODEL),
            "1": init_linear(keys[5], D_MODEL, D_MODEL),
            "2": init_linear(keys[6], D_MODEL, 2),
        }},
    }


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto(
        "cotr/" + conf.get("model_name", "checkpoint.pth.tar"), init,
        "cotr",
        rename=(
            (r"^model\.", ""),
            (r"^backbone\.0\.body\.", "backbone."),
            (r"in_proj_weight$", "in_proj.weight"),
            (r"in_proj_bias$", "in_proj.bias"),
        ),
        drop=(r"query_proj", r"backbone\.1"),
    )


def nerf_encode(xy):
    """(N, 2) [0,1] coords → (N, 4·depth) 'lin_sine' NeRF features with
    the upstream cat order: [sin(kπ·(x,y))]_{k=1..D} ++ [cos(kπ·(x,y))]."""
    bases = jnp.arange(1, NERF_DEPTH + 1, dtype=jnp.float32) * jnp.pi
    ang = xy[:, None, :] * bases[None, :, None]      # (N, D, 2)
    sin = jnp.sin(ang).reshape(xy.shape[0], -1)      # sin(kπx), sin(kπy)
    cos = jnp.cos(ang).reshape(xy.shape[0], -1)
    return jnp.concatenate([sin, cos], -1)


def mha(p, q, k, v):
    """nn.MultiheadAttention (fused in_proj, post out_proj)."""
    d = q.shape[-1]
    dh = d // NHEAD
    w = p["in_proj"]["w"]  # (d, 3d)
    b = p["in_proj"]["b"]
    qp = (q @ w[:, :d] + b[:d]).reshape(-1, NHEAD, dh)
    kp = (k @ w[:, d:2 * d] + b[d:2 * d]).reshape(-1, NHEAD, dh)
    vp = (v @ w[:, 2 * d:] + b[2 * d:]).reshape(-1, NHEAD, dh)
    logits = jnp.einsum("nhd,mhd->hnm", qp, kp,
                        preferred_element_type=jnp.float32) / dh ** 0.5
    attn = jax.nn.softmax(logits, -1)
    msg = jnp.einsum("hnm,mhd->nhd", attn, vp.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return linear(p["out_proj"], msg.reshape(q.shape[0], d).astype(q.dtype))


def enc_layer(p, src, pos):
    q = src + pos
    src = layer_norm(p["norm1"], src + mha(p["self_attn"], q, q, src))
    ffn = linear(p["linear2"], relu(linear(p["linear1"], src)))
    return layer_norm(p["norm2"], src + ffn)


def dec_layer(p, tgt, memory, pos, query_pos):
    q = tgt + query_pos
    tgt = layer_norm(p["norm1"], tgt + mha(p["self_attn"], q, q, tgt))
    tgt = layer_norm(p["norm2"], tgt + mha(
        p["multihead_attn"], tgt + query_pos, memory + pos, memory))
    ffn = linear(p["linear2"], relu(linear(p["linear1"], tgt)))
    return layer_norm(p["norm3"], tgt + ffn)


def backbone_tokens(params, canvas):
    """canvas: (SIZE, 2·SIZE, 3) ImageNet-normalised → memory tokens
    (N, 256) + their NeRF positions."""
    from ..backbones.resnet import (batch_norm_inference, bottleneck_block,
                                    max_pool3_s2)

    p = params["backbone"]
    x = relu(batch_norm_inference(
        p["bn1"], conv2d(p["conv1"], canvas[None], stride=2)))
    x = max_pool3_s2(x)
    for li, n in zip((1, 2, 3), (3, 4, 6)):  # through layer3 only
        layer = p[f"layer{li}"]
        for bi in range(n):
            x = bottleneck_block(layer[str(bi)], x,
                                 2 if (bi == 0 and li > 1) else 1)
    x = conv2d(params["input_proj"], x)      # (1, h, w, 256)
    _, h, w, d = x.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # PositionEmbeddingNeRF: cumsum-of-ones convention → (i + 0.5) / n
    grid = jnp.stack([(gx.reshape(-1) + 0.5) / w,
                      (gy.reshape(-1) + 0.5) / h], -1)
    return x[0].reshape(-1, d), nerf_encode(grid)


def decode(params, memory, pos, queries_xy):
    """Queries (N, 2) in canvas-normalised coords → (N, 2) predicted
    canvas coords."""
    query_pos = nerf_encode(queries_xy)
    tgt = jnp.zeros_like(query_pos)
    dec = params["transformer"]["decoder"]
    for i in range(N_DEC):
        tgt = dec_layer(dec["layers"][str(i)], tgt, memory, pos,
                        query_pos)
    tgt = layer_norm(dec["norm"], tgt)
    ce = params["corr_embed"]["layers"]
    y = relu(linear(ce["0"], tgt))
    y = relu(linear(ce["1"], y))
    return linear(ce["2"], y)


def forward_pair(params, image0, image1, threshold):
    """image*: (SIZE, SIZE, 3) in [0,1]. COTR canvas: [img0 | img1]."""
    canvas = jnp.concatenate([image0, image1], 1)
    canvas = (canvas - IMAGENET_MEAN) / IMAGENET_STD
    memory, pos = backbone_tokens(params, canvas)
    enc = params["transformer"]["encoder"]
    for i in range(N_ENC):
        memory = enc_layer(enc["layers"][str(i)], memory, pos)

    gy, gx = jnp.meshgrid(
        (jnp.arange(GRID) + 0.5) / GRID, (jnp.arange(GRID) + 0.5) / GRID,
        indexing="ij")
    # queries live in the LEFT half of the canvas: x ∈ [0, 0.5)
    q0 = jnp.stack([gx.reshape(-1) * 0.5, gy.reshape(-1)], -1)
    pred1 = decode(params, memory, pos, q0)
    # cycle consistency: map the predictions (right half) back
    pred_back = decode(params, memory, pos, pred1)
    cycle = jnp.linalg.norm(pred_back - q0, axis=-1)
    conf = jnp.exp(-16.0 * cycle)

    # canvas-normalised → per-image pixels (SIZE tile space)
    k0 = jnp.stack([q0[:, 0] * 2 * SIZE, q0[:, 1] * SIZE], -1)
    x1 = jnp.clip(pred1[:, 0] - 0.5, 0.0, 0.5)  # right half
    k1 = jnp.stack([x1 * 2 * SIZE,
                    jnp.clip(pred1[:, 1], 0.0, 1.0) * SIZE], -1)
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
            b = x.shape[0]
            scale = jnp.asarray(
                [x.shape[2] / SIZE, x.shape[1] / SIZE], jnp.float32)
            x = jax.image.resize(x, (b, SIZE, SIZE, x.shape[-1]),
                                 "bilinear")
            return x, scale

        i0, s0 = prep(image0)
        i1, s1 = prep(image1)
        # with random-init weights the confidence head is uncalibrated;
        # keep the conf gate but never fail closed on an untrained head
        thr = self._threshold if self.meta.get("pretrained") else 0.0
        out = _apply_batched(self.params, i0, i1, thr)
        # SIZE-tile coords → input-image pixel coords
        out["keypoints0"] = out["keypoints0"] * s0[None, None]
        out["keypoints1"] = out["keypoints1"] * s1[None, None]
        out["mconf"] = out["scores"]
        return out
