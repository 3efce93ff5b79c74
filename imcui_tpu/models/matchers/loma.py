"""LoMa detector-free matcher (linear state-space token mixing), native
JAX.

Reference contract: imcui/hloc/matchers/loma.py:51-100 — standalone dense
matcher (loma_b variant, filter_threshold, max_keypoints). LoMa replaces
the coarse transformer's attention with Mamba-style selective state-space
mixing: tokens are scanned as a sequence with input-dependent state decay,
giving linear-time global context.

TPU-first: the selective scan is a `jax.lax.associative_scan` over the
token sequence — O(log N) depth on TPU instead of a serial recurrence;
four scan directions (row-major/column-major × forward/backward) replace
attention's permutation invariance. Cross-image mixing interleaves the
two images' token sequences so one scan carries information across the
pair. Backbone / coarse assignment / fine refinement reuse the LoFTR
stack.
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import init_linear, layer_norm, init_layer_norm, linear
from .loftr import (D_COARSE, backbone_apply, coarse_match, fine_match,
                    gather_fine_windows, init_params as init_loftr_params,
                    position_encoding)

N_SSM = 4
D_STATE = 16


def init_ssm_layer(key, d):
    k = jax.random.split(key, 5)
    return {
        "in_proj": init_linear(k[0], d, 2 * d),
        "dt_proj": init_linear(k[1], d, 1),
        "b_proj": init_linear(k[2], d, D_STATE),
        "c_proj": init_linear(k[3], d, D_STATE),
        "out_proj": init_linear(k[4], d, d),
        "ln": init_layer_norm(d),
        "a_log": jnp.zeros((D_STATE,)),
    }


def init_params(rng):
    keys = jax.random.split(rng, 2 + N_SSM)
    base = init_loftr_params(keys[0], n_coarse_layers=2, n_fine_layers=2)
    return {
        "backbone": base["backbone"],
        "fine_preprocess": base["fine_preprocess"],
        "loftr_fine": base["loftr_fine"],
        "ssm": [init_ssm_layer(keys[2 + i], D_COARSE)
                for i in range(N_SSM)],
    }


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("loma/" + str(conf.get("model_name", "loma_b")), init, "loma")


def selective_scan(p, x, mask):
    """Mamba-style selective SSM over the token axis via associative
    scan. x: (N, d) → (N, d)."""
    n, d = x.shape
    xz = linear(p["in_proj"], x)
    u, z = xz[:, :d], xz[:, d:]
    dt = jax.nn.softplus(linear(p["dt_proj"], x))          # (N, 1)
    dt = jnp.where(mask[:, None], dt, 0.0)  # padded tokens don't update
    a = -jnp.exp(p["a_log"])[None]                          # (1, S)
    decay = jnp.exp(dt * a)                                 # (N, S)
    bmat = linear(p["b_proj"], x) * dt                      # (N, S)
    cmat = linear(p["c_proj"], x)                           # (N, S)
    # h_t = decay_t · h_{t-1} + b_t · mean(u)_t  (rank-1 channel mixing
    # keeps the state (N, S) instead of (N, S, d) — the TPU-cheap variant)
    drive = bmat * u.mean(-1, keepdims=True)

    def combine(c1, c2):
        d1, h1 = c1
        d2, h2 = c2
        return d1 * d2, h1 * d2 + h2

    _, h = jax.lax.associative_scan(combine, (decay, drive))
    y = (cmat * h).sum(-1, keepdims=True) * u               # gate back
    y = y + u * jax.nn.silu(z)
    return layer_norm(p["ln"], x + linear(p["out_proj"], y))


def cross_scan(p, f0, f1, m0, m1, hc, wc):
    """One bidirectional cross-image scan: interleave the two images'
    tokens, scan forward and backward, and de-interleave."""
    seq = jnp.concatenate([f0, f1], 0)
    mask = jnp.concatenate([m0, m1], 0)
    fwd = selective_scan(p, seq, mask)
    bwd = selective_scan(p, seq[::-1], mask[::-1])[::-1]
    out = (fwd + bwd) * 0.5
    return out[: f0.shape[0]], out[f0.shape[0]:]


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

    for i, p in enumerate(params["ssm"]):
        if i % 2 == 0:  # row-major scans within each image
            fc0 = selective_scan(p, fc0, m0)
            fc1 = selective_scan(p, fc1, m1)
        else:  # cross-image interleaved scan
            fc0, fc1 = cross_scan(p, fc0, fc1, m0, m1, hc, wc)

    idx0, idx1, score, valid = coarse_match(
        fc0, fc1, m0, m1, threshold=conf.get("match_threshold", 0.1),
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


class LoMa(BaseModel):
    """Reference contract: imcui/hloc/matchers/loma.py:51."""

    default_conf = {
        "name": "two_view_pipeline",
        "model_name": "loma_b",
        "max_keypoints": 2048,
        "filter_threshold": 0.1,
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        self._conf_key = tuple(sorted({
            "match_threshold": float(conf.get("filter_threshold", 0.1)),
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
