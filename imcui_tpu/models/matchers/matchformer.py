"""MatchFormer detector-free matcher (extract-and-match interleaved
attention), native JAX.

Reference contract: imcui/hloc/matchers/matchformer.py:44-100 — standalone
dense matcher {image0, image1} → {keypoints0, keypoints1, mconf}
(largela / outdoor variant, resolution (8, 2)). The published design drops
LoFTR's "extract-then-match" split: a hierarchical (PVT-style) transformer
backbone runs self- AND cross-attention interleaved *inside* every stage,
so features co-evolve with the other image from the shallowest level
("extract-and-match"). Matching heads are LoFTR-style dual-softmax coarse
+ window fine refinement.

TPU-first: stage attention uses spatial-reduction attention (SRA) — K/V
are average-pooled by the stage's reduction ratio, so the logits stay
(N, N/r²): dense MXU matmuls at every stage without N² blowup at /4.
The fine stage reuses the LoFTR window machinery.
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import (batch_norm_inference, conv2d, init_conv, init_linear,
                      init_layer_norm, layer_norm, linear, relu)
from .loftr import (coarse_match, fine_match, gather_fine_windows,
                    init_encoder_layer, position_encoding)

D_COARSE = 256
D_FINE = 128
# (channels, blocks, sr_ratio) per stage; strides 2, 2, 2 → /8 coarse
STAGES = [(64, 1, 8), (128, 1, 4), (256, 2, 2)]
STAGE_STRIDE = 2


def init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_attn_block(key, d):
    k = jax.random.split(key, 6)
    return {
        "q": init_linear(k[0], d, d),
        "kv": init_linear(k[1], d, 2 * d),
        "proj": init_linear(k[2], d, d),
        "ffn1": init_linear(k[3], d, 4 * d),
        "ffn2": init_linear(k[4], 4 * d, d),
        "ln1": init_layer_norm(d),
        "ln2": init_layer_norm(d),
    }


def init_params(rng):
    keys = jax.random.split(rng, 16)
    params = {"embeds": [], "stages": []}
    cin = 1
    ki = 0
    for si, (c, blocks, _) in enumerate(STAGES):
        stride = STAGE_STRIDE
        params["embeds"].append({
            "conv": init_conv(keys[ki], stride + 3, stride + 3, cin, c,
                              bias=False),
            "bn": init_bn(c),
        })
        ki += 1
        params["stages"].append([
            {"self": init_attn_block(jax.random.fold_in(keys[ki], 2 * j),
                                     c),
             "cross": init_attn_block(jax.random.fold_in(keys[ki],
                                                         2 * j + 1), c)}
            for j in range(blocks)
        ])
        ki += 1
        cin = c
    params["coarse_proj"] = init_conv(keys[ki], 1, 1, STAGES[-1][0],
                                      D_COARSE)
    params["fine_proj"] = init_conv(keys[ki + 1], 1, 1, STAGES[0][0],
                                    D_FINE)
    params["loftr_fine"] = {"layers": [
        init_encoder_layer(k, D_FINE)
        for k in jax.random.split(keys[ki + 2], 2)]}
    params["fine_preprocess"] = {
        "down_proj": init_linear(keys[ki + 3], D_COARSE, D_FINE),
        "merge_feat": init_linear(keys[ki + 4], 2 * D_FINE, D_FINE),
    }
    return params


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("matchformer/matchformer_outdoor-large-LA.ckpt", init, "matchformer")


def _pool_tokens(x, h, w, r):
    """Spatial-reduction: (N, d) tokens on an (h, w) grid → (N/r², d)."""
    if r == 1:
        return x
    d = x.shape[-1]
    xm = x.reshape(1, h, w, d)
    from jax import lax
    pooled = lax.reduce_window(xm, 0.0, lax.add, (1, r, r, 1),
                               (1, r, r, 1), "VALID") / (r * r)
    return pooled.reshape(-1, d)


def sra_attention(p, x, source, h, w, r, nhead=4):
    """Spatial-reduction attention: x attends to pooled source tokens."""
    n, d = x.shape
    dh = d // nhead
    q = linear(p["q"], x).reshape(n, nhead, dh)
    src = _pool_tokens(source, h, w, r)
    kv = linear(p["kv"], src).reshape(-1, nhead, 2 * dh)
    k, v = kv[..., :dh], kv[..., dh:]
    logits = jnp.einsum("nhd,mhd->hnm", q, k,
                        preferred_element_type=jnp.float32) / dh ** 0.5
    attn = jax.nn.softmax(logits, -1)
    msg = jnp.einsum("hnm,mhd->nhd", attn, v.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    x = x + linear(p["proj"], msg.reshape(n, d).astype(x.dtype))
    x = layer_norm(p["ln1"], x)
    x = x + linear(p["ffn2"], relu(linear(p["ffn1"], x)))
    return layer_norm(p["ln2"], x)


def backbone_interleaved(params, x0, x1):
    """Extract-and-match: run both images through the staged backbone with
    interleaved self/cross attention. Returns coarse (/8) and fine (/4)
    maps for both images."""
    f0, f1 = x0[None], x1[None]
    fine0 = fine1 = None
    for si, (c, _, r) in enumerate(STAGES):
        e = params["embeds"][si]
        f0 = relu(batch_norm_inference(e["bn"], conv2d(e["conv"], f0,
                                                       stride=STAGE_STRIDE)))
        f1 = relu(batch_norm_inference(e["bn"], conv2d(e["conv"], f1,
                                                       stride=STAGE_STRIDE)))
        h, w = f0.shape[1:3]
        t0 = f0.reshape(-1, c)
        t1 = f1.reshape(-1, c)
        for blk in params["stages"][si]:
            t0 = sra_attention(blk["self"], t0, t0, h, w, r)
            t1 = sra_attention(blk["self"], t1, t1, h, w, r)
            t0n = sra_attention(blk["cross"], t0, t1, h, w, r)
            t1 = sra_attention(blk["cross"], t1, t0, h, w, r)
            t0 = t0n
        f0 = t0.reshape(1, h, w, c)
        f1 = t1.reshape(1, h, w, c)
        if si == 0:
            fine0, fine1 = f0, f1
    coarse0 = conv2d(params["coarse_proj"], f0)[0]
    coarse1 = conv2d(params["coarse_proj"], f1)[0]
    return (coarse0, coarse1,
            conv2d(params["fine_proj"], fine0)[0],
            conv2d(params["fine_proj"], fine1)[0])


def forward_pair(params, image0, image1, wh0, wh1, conf):
    c0m, c1m, f0m, f1m = backbone_interleaved(params, image0, image1)
    hc, wc = c0m.shape[:2]
    pe = position_encoding(hc, wc, D_COARSE)
    fc0 = (c0m + pe).reshape(-1, D_COARSE)
    fc1 = (c1m + pe).reshape(-1, D_COARSE)

    def grid_mask(wh):
        ys = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
        return ((xs < wh[0] // 8) & (ys < wh[1] // 8)).reshape(-1)

    m0 = grid_mask(wh0)
    m1 = grid_mask(wh1)
    idx0, idx1, score, valid = coarse_match(
        fc0, fc1, m0, m1, threshold=conf.get("match_threshold", 0.2),
        max_matches=conf.get("max_matches", 1024))

    # fine windows live at /2 (stage-0 output) → 4 fine cells per coarse
    win0 = gather_fine_windows(f0m, idx0, wc, scale=4)
    win1 = gather_fine_windows(f1m, idx1, wc, scale=4)
    down = params["fine_preprocess"]["down_proj"]
    merge = params["fine_preprocess"]["merge_feat"]
    cc0 = linear(down, jnp.take(fc0, idx0, axis=0))
    cc1 = linear(down, jnp.take(fc1, idx1, axis=0))
    win0 = linear(merge, jnp.concatenate(
        [win0, jnp.broadcast_to(cc0[:, None], win0.shape)], -1))
    win1 = linear(merge, jnp.concatenate(
        [win1, jnp.broadcast_to(cc1[:, None], win1.shape)], -1))
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


class MatchFormer(BaseModel):
    """Reference contract: imcui/hloc/matchers/matchformer.py:44."""

    default_conf = {
        "max_keypoints": 2048,
        "match_threshold": 0.2,
    }
    required_inputs = ["image0", "image1"]
    divisible_size = 32

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        self._conf_key = tuple(sorted({
            "match_threshold": float(conf["match_threshold"]),
            "max_matches": int(conf.get("max_keypoints") or 2048),
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
