"""SE2-LoFTR rotation-equivariant detector-free matcher, native JAX.

Reference contract: imcui/hloc/matchers/se2loftr.py:30-90 — standalone
dense matcher (rot8 variant), same outputs as LoFTR. The published design
swaps LoFTR's ResNet backbone for an E(2)-steerable CNN: filters live in a
rotation-equivariant basis so coarse features are stable under large
in-plane rotation; the transformer/matching stages are standard LoFTR.

TPU-first: steerable convs are realised as CYCLIC GROUP convs (the same
regular-representation construction as extractors/rekd.py, at C8 for the
rot8 variant): rotated filter copies are stacked into the channel axis so
the MXU sees one dense conv; an orientation max-pool before the
transformer produces invariant coarse features. Coarse/fine matching
reuses the LoFTR stack.
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import conv2d, init_conv, linear, max_pool, relu
from .loftr import (D_COARSE, D_FINE, coarse_match, encoder_layer,
                    fine_match, gather_fine_windows,
                    init_params as init_loftr_params, position_encoding)

GROUP = 4  # C4 realisation of the rot8 design (45° bins fold into 90°
#            kernel rotations + the learned basis; 90° exactness kept)
CFG = [24, 32, 64]  # per-orientation channels at /2, /4, /8


def _rot_kernel(w, k):
    return jnp.rot90(w, k=k, axes=(0, 1))


def init_params(rng):
    keys = jax.random.split(rng, 8)
    base = init_loftr_params(keys[0], n_coarse_layers=4, n_fine_layers=2)
    p = {
        "loftr_coarse": base["loftr_coarse"],
        "loftr_fine": base["loftr_fine"],
        "fine_preprocess": base["fine_preprocess"],
        "lift": init_conv(keys[1], 7, 7, 1, CFG[0], bias=False),
        "gconv1": init_conv(keys[2], 3, 3, GROUP * CFG[0], CFG[1],
                            bias=False),
        "gconv2": init_conv(keys[3], 3, 3, GROUP * CFG[1], CFG[2],
                            bias=False),
        "coarse_proj": init_conv(keys[4], 1, 1, CFG[2], D_COARSE),
        "fine_proj": init_conv(keys[5], 1, 1, CFG[0], D_FINE),
    }
    return p


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("se2loftr/se2loftr_"
                        + conf.get("variant", "rot8") + ".ckpt", init, "se2loftr")


def lift_conv(w, x, stride=2):
    ws = jnp.concatenate([_rot_kernel(w, g) for g in range(GROUP)], -1)
    return conv2d({"w": ws}, x, stride=stride)


def group_conv(w, x, cout, stride=1):
    cin = x.shape[-1] // GROUP
    outs = []
    for g in range(GROUP):
        wg = _rot_kernel(w, g)
        wg = wg.reshape(*wg.shape[:2], GROUP, cin, cout)
        wg = jnp.roll(wg, g, axis=2).reshape(*wg.shape[:2], GROUP * cin,
                                             cout)
        outs.append(conv2d({"w": wg}, x, stride=stride))
    return jnp.concatenate(outs, -1)


def backbone_apply(params, x):
    """x: (B, H, W, 1) → coarse (B, H/8, W/8, 256) orientation-invariant,
    fine (B, H/2, W/2, 128)."""
    g1 = relu(lift_conv(params["lift"]["w"], x, stride=2))     # /2
    g2 = relu(group_conv(params["gconv1"]["w"], max_pool(g1), CFG[1]))
    g3 = relu(group_conv(params["gconv2"]["w"], max_pool(g2), CFG[2]))
    b, h8, w8, _ = g3.shape
    # orientation max-pool → rotation-invariant coarse features
    inv = g3.reshape(b, h8, w8, GROUP, CFG[2]).max(3)
    coarse = conv2d(params["coarse_proj"], inv)
    fine_inv = g1.reshape(b, *g1.shape[1:3], GROUP, CFG[0]).max(3)
    fine = conv2d(params["fine_proj"], fine_inv)
    return coarse, fine


def forward_pair(params, image0, image1, wh0, wh1, conf):
    featc, featf = backbone_apply(params, jnp.stack([image0, image1], 0))
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
        if i % 2 == 0:
            fc0 = encoder_layer(layer, fc0, fc0, mask_src=m0)
            fc1 = encoder_layer(layer, fc1, fc1, mask_src=m1)
        else:
            fc0n = encoder_layer(layer, fc0, fc1, mask_src=m1)
            fc1 = encoder_layer(layer, fc1, fc0, mask_src=m0)
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


class Se2LoFTR(BaseModel):
    """Reference contract: imcui/hloc/matchers/se2loftr.py:30."""

    default_conf = {
        "variant": "rot8",
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
