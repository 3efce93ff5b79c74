"""ALIKED extractor with a deformable descriptor head, native JAX/XLA.

Re-implementation of the architecture family behind the reference wrapper
(reference: imcui/hloc/extractors/aliked.py:12-31 — the LightGlue package's
ALIKED: an ALIKE-style conv encoder with a Sparse Deformable Descriptor
Head (SDDH): instead of sampling one feature vector per keypoint, a small
network predicts M deformable offsets around each keypoint, the feature
map is bilinearly sampled at those offsets, and a learned projection
aggregates the M samples into the descriptor).

TPU-first: the SDDH is a fixed-M gather + einsum per keypoint — vmapped
over the fixed-k masked keypoint slots, so the deformable sampling that is
scatter/gather-heavy on GPU becomes two dense gathers and one matmul here.
Offsets are predicted from a gathered K×K patch (no dynamic shapes).
Conversion to the upstream aliked-n16 checkpoint is validated on weight
availability; the conf records the head as ``sddh``.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import conv2d, init_conv, init_linear, linear, max_pool, relu

SIZES = {
    "aliked-t16": dict(c1=8, c2=16, c3=32, c4=64, dim=64, M=16),
    "aliked-n16": dict(c1=16, c2=32, c3=64, c4=128, dim=128, M=16),
    "aliked-n16rot": dict(c1=16, c2=32, c3=64, c4=128, dim=128, M=16),
    "aliked-n32": dict(c1=16, c2=32, c3=64, c4=128, dim=128, M=32),
}
PATCH = 5  # local patch feeding the offset predictor


def init_conv_block(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {"conv1": init_conv(k1, 3, 3, cin, cout),
            "conv2": init_conv(k2, 3, 3, cout, cout)}


def conv_block(p, x):
    return relu(conv2d(p["conv2"], relu(conv2d(p["conv1"], x))))


def init_params(rng, c1, c2, c3, c4, dim, M):
    keys = jax.random.split(rng, 12)
    q = dim // 4
    return {
        "block1": init_conv_block(keys[0], 3, c1),
        "block2": init_conv_block(keys[1], c1, c2),
        "block3": init_conv_block(keys[2], c2, c3),
        "block4": init_conv_block(keys[3], c3, c4),
        "conv1": init_conv(keys[4], 1, 1, c1, q),
        "conv2": init_conv(keys[5], 1, 1, c2, q),
        "conv3": init_conv(keys[6], 1, 1, c3, q),
        "conv4": init_conv(keys[7], 1, 1, c4, q),
        "score_head": init_conv(keys[8], 1, 1, dim, 1),
        # SDDH: patch → M offsets; M samples → descriptor
        "offset_head": init_linear(keys[9], PATCH * PATCH * dim, 2 * M),
        "sample_proj": init_linear(keys[10], dim, dim),
        "agg": init_linear(keys[11], M * dim, dim),
    }


def load_params(conf):
    sizes = SIZES[conf.get("model_name", "aliked-n16")]
    init = init_params(jax.random.PRNGKey(0), **sizes)
    params, meta = load_params_auto(
        conf.get("model_name", "aliked-n16") + ".pth", init, "aliked")
    meta["head"] = "sddh"
    return params, meta


def backbone(p, x):
    """x: (B, H, W, 3) → feature map (B, H, W, dim), score (B, H, W)."""
    x1 = conv_block(p["block1"], x)
    x2 = conv_block(p["block2"], max_pool(x1))
    x3 = conv_block(p["block3"], max_pool(x2))
    x4 = conv_block(p["block4"], max_pool(x3))

    def up(feat, f):
        b, h, w, c = feat.shape
        return jax.image.resize(feat, (b, h * f, w * f, c),
                                method="bilinear")

    feats = jnp.concatenate(
        [relu(conv2d(p["conv1"], x1)),
         up(relu(conv2d(p["conv2"], x2)), 2),
         up(relu(conv2d(p["conv3"], x3)), 4),
         up(relu(conv2d(p["conv4"], x4)), 8)], -1)
    scores = jax.nn.sigmoid(conv2d(p["score_head"], feats))[..., 0]
    return feats, scores


def bilinear_at(fmap, xy):
    """Sample fmap (H, W, C) at float coords xy (..., 2)."""
    h, w, c = fmap.shape
    gx = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    gy = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    wx = (gx - x0)[..., None]
    wy = (gy - y0)[..., None]
    return (
        fmap[y0, x0] * (1 - wx) * (1 - wy)
        + fmap[y0, x0 + 1] * wx * (1 - wy)
        + fmap[y0 + 1, x0] * (1 - wx) * wy
        + fmap[y0 + 1, x0 + 1] * wx * wy
    )


def sddh(params, fmap, kpts, M):
    """Sparse Deformable Descriptor Head for all keypoints at once.
    fmap: (H, W, dim); kpts: (N, 2) xy → (N, dim) descriptors."""
    h, w, dim = fmap.shape
    r = PATCH // 2
    dy = jax.lax.broadcasted_iota(jnp.int32, (PATCH, PATCH), 0) - r
    dx = jax.lax.broadcasted_iota(jnp.int32, (PATCH, PATCH), 1) - r
    ix = jnp.clip(kpts[:, 0].astype(jnp.int32)[:, None, None] + dx[None],
                  0, w - 1)
    iy = jnp.clip(kpts[:, 1].astype(jnp.int32)[:, None, None] + dy[None],
                  0, h - 1)
    patches = fmap[iy, ix].reshape(kpts.shape[0], -1)  # (N, P²·dim)
    offsets = jnp.tanh(linear(params["offset_head"], patches))
    offsets = offsets.reshape(-1, M, 2) * (2 * r)  # (N, M, 2) in ±2r px
    sample_xy = kpts[:, None, :] + offsets  # (N, M, 2)
    samples = bilinear_at(fmap, sample_xy)  # (N, M, dim)
    samples = relu(linear(params["sample_proj"], samples))
    desc = linear(params["agg"], samples.reshape(kpts.shape[0], -1))
    return desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)


@functools.partial(
    jax.jit,
    static_argnames=("max_keypoints", "nms_radius", "detection_threshold",
                     "M"),
)
def apply(params, image, valid_wh, max_keypoints=1024, nms_radius=2,
          detection_threshold=0.2, M=16):
    x = image.transpose(0, 2, 3, 1)
    fmap, heat = backbone(params, x)
    h, w = heat.shape[1:]

    def per_image(scores, f, vwh):
        s = nms_ops.simple_nms(scores, nms_radius)
        s = s * nms_ops.border_mask(h, w, 2, valid_wh=vwh, dtype=s.dtype)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            s, max_keypoints, detection_threshold)
        kpts = nms_ops.soft_argmax_refinement(kpts, scores, radius=2)
        desc = sddh(params, f, kpts, M)
        return kpts, kscores, desc.T, mask

    kpts, kscores, desc, mask = jax.vmap(per_image)(heat, fmap, valid_wh)
    return {"keypoints": kpts, "scores": kscores, "descriptors": desc,
            "mask": mask}


@functools.partial(jax.jit, static_argnames=("M",))
def apply_describe(params, image, kpts, M=16):
    """Describe externally supplied keypoints with the SDDH head
    (the reference third-party ALIKED exposes this as ``describe`` —
    used by extractors/raco.py)."""
    fmap, _ = backbone(params, image.transpose(0, 2, 3, 1))
    return jax.vmap(lambda f, kp: sddh(params, f, kp, M).T)(fmap, kpts)


class ALIKED(BaseModel):
    """Reference contract: imcui/hloc/extractors/aliked.py:12-31."""

    default_conf = {
        "model_name": "aliked-n16",
        "max_num_keypoints": -1,
        "detection_threshold": 0.2,
        "nms_radius": 2,
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        self._M = SIZES[conf["model_name"]]["M"]
        n = conf["max_num_keypoints"]
        self._max_kpts = 4096 if n in (-1, None) else int(n)

    def describe(self, image, kpts, valid_wh=None):
        """(B, 3, H, W), (B, N, 2) → (B, dim, N) SDDH descriptors at the
        given keypoints."""
        image = jnp.asarray(image, jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))
        h, w = image.shape[2:]
        hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
        if (hp, wp) != (h, w):  # backbone needs /8-aligned inputs
            image = jnp.pad(image, ((0, 0), (0, 0), (0, hp - h),
                                    (0, wp - w)))
        return apply_describe(self.params, image,
                              jnp.asarray(kpts, jnp.float32), M=self._M)

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))
        b, _, h, w = image.shape
        hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
        if (hp, wp) != (h, w):
            image = jnp.pad(image, ((0, 0), (0, 0), (0, hp - h),
                                    (0, wp - w)))
        valid_wh = jnp.asarray(
            data.get("valid_wh",
                     jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))),
            jnp.int32,
        )
        return apply(
            self.params, image, valid_wh,
            max_keypoints=self._max_kpts,
            nms_radius=self.conf["nms_radius"],
            detection_threshold=float(self.conf["detection_threshold"]),
            M=self._M,
        )
