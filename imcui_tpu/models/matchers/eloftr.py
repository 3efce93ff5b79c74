"""EfficientLoFTR dense matcher, native JAX/XLA.

Re-implementation of the architecture family behind the reference wrapper
(reference: imcui/hloc/matchers/eloftr.py:24-99 — EfficientLoFTR submodule:
reparameterised (RepVGG-style) backbone and *aggregated attention*: tokens
are 2×2-aggregated before full attention, then the messages are broadcast
back, cutting coarse-attention cost ~16× vs LoFTR's linear attention at
the same grid).

Shares the coarse-match / fine-refinement machinery with loftr.py; the
backbone uses inference-time-fused RepVGG blocks (single 3×3 conv + bias —
the re-parameterised form the reference selects at eloftr.py:61).
dfactor 32 (reference conf: configs/matchers.py eloftr preprocessing).
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import conv2d, init_conv, relu
from . import loftr as loftr_mod

D_COARSE = 256
D_FINE = 64


def init_repvgg_stage(key, cin, cout, n_blocks, stride):
    keys = jax.random.split(key, n_blocks)
    blocks = [init_conv(keys[0], 3, 3, cin, cout)]
    for k in keys[1:]:
        blocks.append(init_conv(k, 3, 3, cout, cout))
    return blocks


def repvgg_stage(blocks, x, stride):
    for i, p in enumerate(blocks):
        x = relu(conv2d(p, x, stride=stride if i == 0 else 1))
    return x


def init_params(rng, n_coarse_layers=4, n_fine_layers=2):
    keys = jax.random.split(rng, 10 + n_coarse_layers + n_fine_layers)
    params = {
        "backbone": {
            "stage1": init_repvgg_stage(keys[0], 1, 64, 2, 2),    # 1/2
            "stage2": init_repvgg_stage(keys[1], 64, 128, 2, 2),  # 1/4
            "stage3": init_repvgg_stage(keys[2], 128, 256, 3, 2),  # 1/8
            "fine_conv": init_conv(keys[3], 1, 1, 64, D_FINE),
        },
        "loftr_coarse": {"layers": [
            loftr_mod.init_encoder_layer(keys[4 + i], D_COARSE)
            for i in range(n_coarse_layers)
        ]},
        "loftr_fine": {"layers": [
            loftr_mod.init_encoder_layer(
                keys[6 + n_coarse_layers + i], D_FINE)
            for i in range(n_fine_layers)
        ]},
    }
    from ..layers import init_linear

    k1, k2 = jax.random.split(keys[5 + n_coarse_layers])
    params["fine_preprocess"] = {
        "down_proj": init_linear(k1, D_COARSE, D_FINE),
        "merge_feat": init_linear(k2, 2 * D_FINE, D_FINE),
    }
    return params


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("eloftr_outdoor.ckpt", init, "eloftr")


def backbone_apply(p, x):
    """x: (B, H, W, 1) → coarse (B, H/8, W/8, 256), fine (B, H/2, W/2, 64)."""
    x1 = repvgg_stage(p["stage1"], x, 2)    # 1/2, 64
    x2 = repvgg_stage(p["stage2"], x1, 2)   # 1/4, 128
    x3 = repvgg_stage(p["stage3"], x2, 2)   # 1/8, 256
    fine = conv2d(p["fine_conv"], x1)       # 1/2, 64
    return x3, fine


def aggregated_attention(layer, x, source, grid_hw, src_hw, nhead=8):
    """EfficientLoFTR's core trick: 2×2-aggregate tokens, attend at the
    cheap 1/16 resolution, broadcast messages back to the 1/8 grid."""
    h, w = grid_hw
    hs, ws = src_hw
    d = x.shape[-1]

    def pool(t, th, tw):
        g = t.reshape(th, tw, d)
        g = g.reshape(th // 2, 2, tw // 2, 2, d).mean((1, 3))
        return g.reshape(-1, d)

    xa = pool(x, h, w)
    sa = pool(source, hs, ws)
    out = loftr_mod.encoder_layer(layer, xa, sa, nhead=nhead)
    delta = (out - xa).reshape(h // 2, w // 2, d)
    delta = jnp.repeat(jnp.repeat(delta, 2, 0), 2, 1).reshape(-1, d)
    return x + delta


def forward_pair(params, image0, image1, mask_wh0, mask_wh1, conf):
    featc, featf = backbone_apply(
        params["backbone"], jnp.stack([image0, image1], 0))
    hc, wc = featc.shape[1:3]
    pe = loftr_mod.position_encoding(hc, wc, D_COARSE)
    fc0 = (featc[0] + pe).reshape(-1, D_COARSE)
    fc1 = (featc[1] + pe).reshape(-1, D_COARSE)

    def grid_mask(wh):
        ys = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
        return ((xs < wh[0] // 8) & (ys < wh[1] // 8)).reshape(-1)

    m0 = grid_mask(mask_wh0)
    m1 = grid_mask(mask_wh1)

    for i, layer in enumerate(params["loftr_coarse"]["layers"]):
        if i % 2 == 0:
            fc0 = aggregated_attention(layer, fc0, fc0, (hc, wc), (hc, wc))
            fc1 = aggregated_attention(layer, fc1, fc1, (hc, wc), (hc, wc))
        else:
            fc0n = aggregated_attention(layer, fc0, fc1, (hc, wc), (hc, wc))
            fc1 = aggregated_attention(layer, fc1, fc0, (hc, wc), (hc, wc))
            fc0 = fc0n

    idx0, idx1, score, valid = loftr_mod.coarse_match(
        fc0, fc1, m0, m1, temperature=conf.get("temperature", 0.1),
        threshold=conf.get("match_threshold", 0.2),
        max_matches=conf.get("max_matches", 1024),
    )

    from ..layers import linear

    win0 = loftr_mod.gather_fine_windows(featf[0], idx0, wc)
    win1 = loftr_mod.gather_fine_windows(featf[1], idx1, wc)
    c0 = linear(params["fine_preprocess"]["down_proj"],
                jnp.take(fc0, idx0, axis=0))
    c1 = linear(params["fine_preprocess"]["down_proj"],
                jnp.take(fc1, idx1, axis=0))
    win0 = linear(params["fine_preprocess"]["merge_feat"],
                  jnp.concatenate(
                      [win0, jnp.broadcast_to(c0[:, None], win0.shape)], -1))
    win1 = linear(params["fine_preprocess"]["merge_feat"],
                  jnp.concatenate(
                      [win1, jnp.broadcast_to(c1[:, None], win1.shape)], -1))
    offsets1 = loftr_mod.fine_match(params, win0, win1, valid)

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


class ELoFTR(BaseModel):
    """Reference contract: imcui/hloc/matchers/eloftr.py:24-99 —
    standalone dense matcher, dfactor 32."""

    default_conf = {
        "weights": "weights/eloftr_outdoor.ckpt",
        "match_threshold": 0.2,
        "max_keypoints": 1024,
        "temperature": 0.1,
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        mm = conf.get("max_keypoints") or 1024
        self._conf_key = tuple(sorted({
            "match_threshold": float(conf["match_threshold"]),
            "temperature": float(conf["temperature"]),
            "max_matches": int(mm),
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

        out = _apply_batched(self.params, img0, img1,
                             wh("size0", img0), wh("size1", img1),
                             self._conf_key)
        out["mconf"] = out["scores"]
        return out
