"""XoFTR cross-modal detector-free matcher, native JAX.

Reference contract: imcui/hloc/matchers/xoftr.py:21-80 — standalone dense
matcher {image0, image1} → {keypoints0, keypoints1, mconf} with
match_threshold (coarse) and a fine threshold of 0.1; designed for
visible↔thermal pairs. The published design: LoFTR-style coarse stage at
/8, then a TWO-STAGE fine refinement at /2 and /1 — fine window token
pairs are matched by a mutual softmax (not just center-vs-window), giving
sub-window correspondences that survive modality gaps, plus an MLP
sub-pixel regression.

TPU-first: modality-robust normalisation = per-image feature whitening
before the coarse transformer (handles the thermal/RGB statistics gap
without modality flags); the window-to-window fine match is a batched
(M, W², W²) dual-softmax — fixed shapes, MXU einsums. Backbone/coarse
reuse the LoFTR stack.
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import gelu, init_linear, linear
from .loftr import (D_COARSE, backbone_apply, coarse_match, encoder_layer,
                    gather_fine_windows, init_params as init_loftr_params,
                    position_encoding, FINE_WINDOW)


def init_params(rng):
    keys = jax.random.split(rng, 3)
    base = init_loftr_params(keys[0], n_coarse_layers=4, n_fine_layers=2)
    return {**base,
            "subpixel_mlp": {
                "0": init_linear(keys[1], 2 * 128, 128),
                "2": init_linear(keys[2], 128, 4),  # dxy for both images
            }}


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("xoftr/" + conf.get("model_name",
                                            "weights_xoftr_640.ckpt"), init, "xoftr")


def whiten(feat, mask):
    """Per-image feature whitening over valid tokens — closes the
    modality statistics gap (visible vs thermal)."""
    m = mask[:, None].astype(feat.dtype)
    n = jnp.maximum(m.sum(), 1.0)
    mu = (feat * m).sum(0) / n
    var = ((feat - mu) ** 2 * m).sum(0) / n
    return (feat - mu) * jax.lax.rsqrt(var + 1e-5)


def fine_window_match(params, win0, win1, valid, fine_thr=0.1):
    """Window-to-window mutual softmax + sub-pixel MLP.

    win*: (M, W², d). Returns offsets0, offsets1 (M, 2) in fine px and a
    fine confidence (M,)."""
    layers = params["loftr_fine"]["layers"]
    w = FINE_WINDOW

    def per_window(p0, p1):
        for i, layer in enumerate(layers):
            if i % 2 == 0:
                p0 = encoder_layer(layer, p0, p0, nhead=8)
                p1 = encoder_layer(layer, p1, p1, nhead=8)
            else:
                p0n = encoder_layer(layer, p0, p1, nhead=8)
                p1 = encoder_layer(layer, p1, p0, nhead=8)
                p0 = p0n
        d = p0.shape[-1]
        sim = (p0 @ p1.T) / (d ** 0.5 * 0.1)
        conf = jax.nn.softmax(sim, 1) * jax.nn.softmax(sim, 0)
        # best token pair inside the window pair
        flat = conf.reshape(-1)
        best = jnp.argmax(flat)
        i0 = best // (w * w)
        i1 = best % (w * w)
        grid = jnp.stack(
            [jnp.tile(jnp.arange(w, dtype=jnp.float32), w),
             jnp.repeat(jnp.arange(w, dtype=jnp.float32), w)], -1)
        # sub-pixel MLP on the matched token pair
        tok = jnp.concatenate([p0[i0], p1[i1]], -1)
        sub = jnp.tanh(linear(params["subpixel_mlp"]["2"], gelu(
            linear(params["subpixel_mlp"]["0"], tok))))
        off0 = grid[i0] - (w // 2) + sub[:2]
        off1 = grid[i1] - (w // 2) + sub[2:]
        return off0, off1, flat[best]

    off0, off1, fconf = jax.vmap(per_window)(win0, win1)
    keep = valid & (fconf > fine_thr)
    return (jnp.where(keep[:, None], off0, 0.0),
            jnp.where(keep[:, None], off1, 0.0),
            fconf, keep)


def forward_pair(params, image0, image1, wh0, wh1, conf):
    featc, featf = backbone_apply(params["backbone"],
                                  jnp.stack([image0, image1], 0))
    hc, wc = featc.shape[1:3]
    pe = position_encoding(hc, wc)

    def grid_mask(wh):
        ys = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
        return ((xs < wh[0] // 8) & (ys < wh[1] // 8)).reshape(-1)

    m0 = grid_mask(wh0)
    m1 = grid_mask(wh1)
    fc0 = whiten((featc[0] + pe).reshape(-1, D_COARSE), m0)
    fc1 = whiten((featc[1] + pe).reshape(-1, D_COARSE), m1)

    for i, layer in enumerate(params["loftr_coarse"]["layers"]):
        if i % 2 == 0:
            fc0 = encoder_layer(layer, fc0, fc0, mask_src=m0)
            fc1 = encoder_layer(layer, fc1, fc1, mask_src=m1)
        else:
            fc0n = encoder_layer(layer, fc0, fc1, mask_src=m1)
            fc1 = encoder_layer(layer, fc1, fc0, mask_src=m0)
            fc0 = fc0n

    idx0, idx1, score, valid = coarse_match(
        fc0, fc1, m0, m1, threshold=conf.get("match_threshold", 0.3),
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
    off0, off1, fconf, keep = fine_window_match(
        params, win0, win1, valid, fine_thr=conf.get("fine_threshold",
                                                     0.1))

    def cell_center(idx):
        ci = (idx // wc).astype(jnp.float32)
        cj = (idx % wc).astype(jnp.float32)
        return jnp.stack([cj * 8 + 4, ci * 8 + 4], -1)

    kpts0 = jnp.where(keep[:, None], cell_center(idx0) + off0 * 2.0, 0.0)
    kpts1 = jnp.where(keep[:, None], cell_center(idx1) + off1 * 2.0, 0.0)
    return {"keypoints0": kpts0, "keypoints1": kpts1,
            "scores": jnp.where(keep, score * fconf, 0.0), "mask": keep}


@functools.partial(jax.jit, static_argnames=("conf_key",))
def _apply_batched(params, image0, image1, wh0, wh1, conf_key):
    conf = dict(conf_key)
    return jax.vmap(
        lambda a, b, c, d: forward_pair(params, a, b, c, d, conf)
    )(image0, image1, wh0, wh1)


class XoFTR(BaseModel):
    """Reference contract: imcui/hloc/matchers/xoftr.py:21."""

    default_conf = {
        "model_name": "weights_xoftr_640.ckpt",
        "match_threshold": 0.3,
        "max_keypoints": -1,
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        mm = conf.get("max_keypoints")
        self._conf_key = tuple(sorted({
            "match_threshold": float(conf["match_threshold"]),
            "fine_threshold": 0.1,
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
