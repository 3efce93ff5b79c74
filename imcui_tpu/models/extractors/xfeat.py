"""XFeat (accelerated features) extractor, native JAX/XLA.

Re-implementation of the architecture behind the reference wrapper
(reference: imcui/hloc/extractors/xfeat.py:8-33 — torch.hub verlab model,
sparse ``detectAndCompute`` mode; rebuilt from the published design:
instance-normalised input, a small 5-block CNN with a 1/4-resolution skip,
multi-scale fusion at 1/8, a sigmoid reliability heatmap head, a 65-way
cell keypoint head on an 8×8 unfold of the raw image, and 64-d dense
descriptors).

TPU-first: fixed-k masked keypoints; detection = heatmap × cell-softmax
scores with NMS + approx top-k on device; descriptors bilinearly sampled
from the 1/8 map and L2-normalised.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...ops import sampling
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import (batch_norm_inference, conv2d, init_conv, init_linear,
                      relu)


def init_bn(c):
    # upstream BasicLayer uses BatchNorm2d(affine=False): running stats only
    return {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_basic(key, cin, cout, k=3):
    return {"layer": {"0": init_conv(key, k, k, cin, cout, bias=False),
                      "1": init_bn(cout)}}


def basic(p, x, stride=1):
    return relu(batch_norm_inference(
        p["layer"]["1"], conv2d(p["layer"]["0"], x, stride=stride)))


BLOCKS = {
    # name: [(cin, cout, stride, k)] — upstream XFeatModel layer for layer
    # (verlab accelerated_features modules/model.py; block3/block5 end in
    # 1×1 BasicLayers)
    "block1": [(1, 4, 1, 3), (4, 8, 2, 3), (8, 8, 1, 3), (8, 24, 2, 3)],
    "block2": [(24, 24, 1, 3), (24, 24, 1, 3)],
    "block3": [(24, 64, 2, 3), (64, 64, 1, 3), (64, 64, 1, 1)],
    "block4": [(64, 64, 2, 3), (64, 64, 1, 3), (64, 64, 1, 3)],
    "block5": [(64, 128, 2, 3), (128, 128, 1, 3), (128, 128, 1, 3),
               (128, 64, 1, 1)],
    "block_fusion": [(64, 64, 1, 3), (64, 64, 1, 3)],
    "heatmap_head": [(64, 64, 1, 1), (64, 64, 1, 1)],
    "keypoint_head": [(64, 64, 1, 1), (64, 64, 1, 1), (64, 64, 1, 1)],
}

# fine_matcher MLP (used by the dense/star matching mode): Sequential of
# Linear/BatchNorm1d(affine=False)/ReLU keyed by upstream indices
FINE_MLP = [(0, 128, 512), (3, 512, 512), (6, 512, 512), (9, 512, 512),
            (12, 512, 64)]


def init_params(rng):
    keys = jax.random.split(rng, 48)
    ki = 0
    params = {}
    for name, spec in BLOCKS.items():
        params[name] = []
        for cin, cout, s, k in spec:
            params[name].append(init_basic(keys[ki], cin, cout, k))
            ki += 1
    params["skip1"] = init_conv(keys[ki], 1, 1, 1, 24)
    ki += 1
    params["fusion_out"] = init_conv(keys[ki], 1, 1, 64, 64)
    ki += 1
    params["heatmap_out"] = init_conv(keys[ki], 1, 1, 64, 1)
    ki += 1
    params["keypoint_out"] = init_conv(keys[ki], 1, 1, 64, 65)
    ki += 1
    fine = {}
    for idx, din, dout in FINE_MLP:
        fine[str(idx)] = init_linear(keys[ki], din, dout)
        ki += 1
        if idx != 12:
            fine[str(idx + 1)] = {"mean": jnp.zeros((dout,)),
                                  "var": jnp.ones((dout,))}
    params["fine_matcher"] = fine
    return params


def load_params(conf):
    """xfeat.pt is the raw XFeatModel state_dict; the only naming deltas
    are the trailing plain-Conv2d head layers we hold as separate nodes."""
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto(
        "xfeat.pt", init, "xfeat",
        rename=(
            (r"^skip1\.1\.", "skip1."),
            (r"^block_fusion\.2\.", "fusion_out."),
            (r"^heatmap_head\.2\.", "heatmap_out."),
            (r"^keypoint_head\.3\.", "keypoint_out."),
        ),
    )


def instance_norm(x, eps=1e-5):
    mean = x.mean((1, 2), keepdims=True)
    var = ((x - mean) ** 2).mean((1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _run_block(plist, spec, x):
    for p, (cin, cout, s, k) in zip(plist, spec):
        x = basic(p, x, stride=s)
    return x


def _resize_to(x, hw):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method="bilinear")


def unfold8(x):
    """(B, H, W, 1) → (B, H/8, W/8, 64) block-unfold (keypoint branch)."""
    b, h, w, _ = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, h // 8, w // 8, 64)


def backbone(params, x):
    """x: (B, H, W, 1) → feats (B, H/8, W/8, 64), heat (B, H/8, W/8),
    cell_logits (B, H/8, W/8, 65)."""
    xn = instance_norm(x)
    x1 = _run_block(params["block1"], BLOCKS["block1"], xn)  # 1/4, 24
    skip = conv2d(params["skip1"],
                  jax.lax.reduce_window(
                      xn, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 4, 4, 1),
                      "VALID") / 16.0)
    x2 = _run_block(params["block2"], BLOCKS["block2"], x1 + skip)
    x3 = _run_block(params["block3"], BLOCKS["block3"], x2)  # 1/8, 64
    x4 = _run_block(params["block4"], BLOCKS["block4"], x3)  # 1/16
    x5 = _run_block(params["block5"], BLOCKS["block5"], x4)  # 1/32, 64
    hw = x3.shape[1:3]
    fused = x3 + _resize_to(x4, hw) + _resize_to(x5, hw)
    feats = conv2d(
        params["fusion_out"],
        _run_block(params["block_fusion"], BLOCKS["block_fusion"], fused),
    )
    heat = jax.nn.sigmoid(
        conv2d(params["heatmap_out"],
               _run_block(params["heatmap_head"], BLOCKS["heatmap_head"],
                          feats))
    )[..., 0]
    kpt_logits = conv2d(
        params["keypoint_out"],
        _run_block(params["keypoint_head"], BLOCKS["keypoint_head"],
                   unfold8(xn)),
    )
    return feats, heat, kpt_logits


@functools.partial(
    jax.jit, static_argnames=("max_keypoints", "detection_threshold")
)
def apply(params, image, valid_wh, max_keypoints=4096,
          detection_threshold=0.05):
    """image: (B, 1, H, W), H/W multiples of 32.

    Published ``detectAndCompute`` ordering (verlab accelerated_features
    xfeat.py): NMS is a plain 5×5 equality test on the cell-softmax
    heatmap K1h alone (threshold on K1h); the ranking/output score is
    K1h × H1 with the reliability map H1 sampled through XFeat's
    quirk grid (normalised by W−1/H−1, sampled align_corners=False);
    descriptors are sampled from the L2-normalised 1/8 map with a
    BICUBIC kernel and re-normalised."""
    x = image.transpose(0, 2, 3, 1)
    feats, heat, kpt_logits = backbone(params, x)
    feats = feats / jnp.maximum(
        jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
    probs = jax.nn.softmax(kpt_logits, -1)[..., :64]

    def to_full(p):  # (Hc, Wc, 64) → (H, W)
        return nms_ops.depth_to_space(p.transpose(2, 0, 1), 8)[0]

    k1h = jax.vmap(to_full)(probs)
    h, w = k1h.shape[1:]

    # pixel grid in XFeat's quirk normalisation, for the dense H1 lookup
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    pix = jnp.stack([xs, ys], -1)

    def per_image(scores, hmap, fmap, vwh):
        local_max = (scores == nms_ops.max_pool_2d(scores, 2)) \
            & (scores > detection_threshold)
        hup = sampling.grid_sample(
            hmap[..., None], sampling.xfeat_grid(pix, h, w),
            mode="bilinear")[..., 0]
        rank = jnp.where(local_max, scores * hup, 0.0)
        rank = rank * nms_ops.border_mask(h, w, 1, valid_wh=vwh,
                                          dtype=rank.dtype)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            rank, max_keypoints, 0.0)
        desc = sampling.grid_sample(
            fmap, sampling.xfeat_grid(kpts, h, w), mode="bicubic")
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        return kpts, kscores, desc.T, mask

    kpts, kscores, desc, mask = jax.vmap(per_image)(
        k1h, heat, feats, valid_wh)
    return {"keypoints": kpts, "scores": kscores, "descriptors": desc,
            "mask": mask}


class XFeat(BaseModel):
    """Reference contract: imcui/hloc/extractors/xfeat.py:8-33."""

    default_conf = {
        "keypoint_threshold": 0.05,
        "max_keypoints": 4096,
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        if conf["max_keypoints"] in (-1, None):
            conf["max_keypoints"] = 4096

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 3:
            image = image.mean(1, keepdims=True)
        b, _, h, w = image.shape
        # published preprocess_tensor: RESIZE (bilinear, half-pixel) down
        # to /32 multiples — not pad — then rescale keypoints back
        hp, wp = max(h // 32, 1) * 32, max(w // 32, 1) * 32
        if (hp, wp) != (h, w):
            image = jax.image.resize(image, (b, 1, hp, wp), "bilinear")
        if "valid_wh" in data:
            valid_wh = jnp.asarray(data["valid_wh"], jnp.float32)
            valid_wh = jnp.stack(
                [valid_wh[:, 0] * (wp / w), valid_wh[:, 1] * (hp / h)],
                -1).astype(jnp.int32)
        else:
            valid_wh = jnp.tile(jnp.asarray([[wp, hp]], jnp.int32), (b, 1))
        out = apply(
            self.params, image, valid_wh,
            max_keypoints=self.conf["max_keypoints"],
            detection_threshold=float(self.conf["keypoint_threshold"]),
        )
        if (hp, wp) != (h, w):
            out = dict(out)
            out["keypoints"] = out["keypoints"] * jnp.asarray(
                [w / wp, h / hp], jnp.float32)
        return out
