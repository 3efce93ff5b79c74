"""JamMa detector-free matcher (joint Mamba scanning), native JAX.

Reference contract: imcui/hloc/configs/matchers.py "jamma" entry (model
name ``jamma``, weights jamma_weight.ckpt, match_threshold 0.3, /16
coarse). JamMa's design point vs LoMa: the two images' coarse tokens are
JOINTLY scanned from the first layer — a single interleaved sequence per
scan direction (JEGO: joint, efficient, global, omnidirectional) — rather
than alternating per-image and cross-image mixing.

Shares the selective-scan machinery with matchers/loma.py; every layer
here is a joint scan over the interleaved pair sequence, with row-major
and column-major orderings alternating between layers (the
omnidirectional part, realised as a fixed permutation of the token axis).
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import linear
from .loftr import (D_COARSE, backbone_apply, coarse_match, fine_match,
                    gather_fine_windows, init_params as init_loftr_params,
                    position_encoding)
from .loma import init_ssm_layer, selective_scan

N_LAYERS = 4


def init_params(rng):
    keys = jax.random.split(rng, 2 + N_LAYERS)
    base = init_loftr_params(keys[0], n_coarse_layers=2, n_fine_layers=2)
    return {
        "backbone": base["backbone"],
        "fine_preprocess": base["fine_preprocess"],
        "loftr_fine": base["loftr_fine"],
        "ssm": [init_ssm_layer(keys[2 + i], D_COARSE)
                for i in range(N_LAYERS)],
    }


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("jamma/" + conf.get("weights",
                                            "jamma_weight.ckpt"), init, "jamma")


def _col_major_perm(hc, wc):
    idx = jnp.arange(hc * wc).reshape(hc, wc)
    return idx.T.reshape(-1)


def joint_scan(p, f0, f1, m0, m1, perm=None):
    """Interleave both images token-by-token, scan fwd+bwd, split back."""
    n = f0.shape[0]
    if perm is not None:
        f0p, f1p = f0[perm], f1[perm]
        m0p, m1p = m0[perm], m1[perm]
    else:
        f0p, f1p, m0p, m1p = f0, f1, m0, m1
    # interleave: [a0, b0, a1, b1, ...] — joint scanning (JEGO)
    seq = jnp.stack([f0p, f1p], 1).reshape(2 * n, -1)
    mask = jnp.stack([m0p, m1p], 1).reshape(2 * n)
    fwd = selective_scan(p, seq, mask)
    bwd = selective_scan(p, seq[::-1], mask[::-1])[::-1]
    out = ((fwd + bwd) * 0.5).reshape(n, 2, -1)
    o0, o1 = out[:, 0], out[:, 1]
    if perm is not None:
        inv = jnp.argsort(perm)
        o0, o1 = o0[inv], o1[inv]
    return o0, o1


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
    colp = _col_major_perm(hc, wc)
    for i, p in enumerate(params["ssm"]):
        perm = colp if i % 2 else None  # omnidirectional: row/col scans
        fc0, fc1 = joint_scan(p, fc0, fc1, m0, m1, perm=perm)

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


class JamMa(BaseModel):
    """Reference contract: imcui/hloc/configs/matchers.py "jamma"."""

    default_conf = {
        "weights": "jamma_weight.ckpt",
        "max_keypoints": 2000,
        "match_threshold": 0.3,
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        self._conf_key = tuple(sorted({
            "match_threshold": float(conf["match_threshold"]),
            "max_matches": int(conf.get("max_keypoints") or 2000),
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
