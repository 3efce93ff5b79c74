"""ALIKED extractor with a deformable descriptor head, native JAX/XLA.

Re-implementation of the published architecture behind the reference
wrapper (reference: imcui/hloc/extractors/aliked.py:12-31, wrapping the
LightGlue package's ALIKED). Published layout (Shiaoming/ALIKED nets,
pinned by the torch restatement fixtures in tests/test_torch_parity3.py):

- gate is SELU everywhere; pooling is AvgPool — ``pool2`` (2×2) before
  block2, ``pool4`` (4×4) before block3 and block4, so the pyramid sits
  at strides 1, 1/2, 1/8, 1/32 (same schedule as ALIKE's ALNet).
- block1 is a ConvBlock (two bias-free 3×3 convs + BatchNorm); blocks
  2–4 are ResBlocks with a plain biased 1×1 ``downsample`` conv; blocks
  3 and 4 use DEFORMABLE convs (``conv{1,2}.offset_conv`` regular 3×3
  predicting 18 offset channels clamped to ±max(h,w)/4 +
  ``conv{1,2}.regular_conv`` applied via torchvision deform_conv2d
  semantics — ops/deform.py).
- aggregation: bias-free 1×1 conv to dim//4 + gate per stage, bilinear
  ``align_corners=True`` upsampling, channel concat; the dense feature
  map is L2-normalised; the score head is the 4-conv Sequential
  1×1(dim→8) → 3×3(8→4) → 3×3(4→4) → 3×3(4→1), all bias-free, gated
  between, sigmoid at the end.
- SDDH (Sparse Deformable Descriptor Head): a K×K patch around each
  keypoint feeds ``offset_conv`` (3×3 VALID conv → gate → 1×1 conv,
  both biased) predicting M (Δx, Δy) offsets clamped to ±max(h,w)/4;
  the NORMALISED feature map is bilinearly sampled (grid_sample
  align_corners=True, ALIKE convention) at keypoint+offset, each sample
  passes the 1×1 bias-free ``sf_conv`` + gate, and the concatenated M
  samples are projected by the 1×1 bias-free ``convM``; descriptors are
  L2-normalised.

TPU-first: the deformable convs lower as k² dense bilinear gathers +
MXU einsums; the SDDH is fixed-M gathers + matmuls vmapped over the
masked keypoint slots — no dynamic shapes anywhere. Param-tree keys
mirror the upstream ``aliked-*.pth`` state_dict naming.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...ops.deform import deform_conv2d
from ...ops.resize import torch_interpolate
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..backbones.resnet import init_bn
from ..layers import batch_norm_inference, conv2d, init_conv

SIZES = {
    "aliked-t16": dict(c1=8, c2=16, c3=32, c4=64, dim=64, K=3, M=16),
    "aliked-n16": dict(c1=16, c2=32, c3=64, c4=128, dim=128, K=3, M=16),
    "aliked-n16rot": dict(c1=16, c2=32, c3=64, c4=128, dim=128, K=3,
                          M=16),
    "aliked-n32": dict(c1=16, c2=32, c3=64, c4=128, dim=128, K=3, M=32),
}


def selu(x):
    return jax.nn.selu(x)


def avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / float(k * k)


def init_conv_block(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {"conv1": init_conv(k1, 3, 3, cin, cout, bias=False),
            "bn1": init_bn(cout),
            "conv2": init_conv(k2, 3, 3, cout, cout, bias=False),
            "bn2": init_bn(cout)}


def conv_block(p, x):
    x = selu(batch_norm_inference(p["bn1"], conv2d(p["conv1"], x)))
    return selu(batch_norm_inference(p["bn2"], conv2d(p["conv2"], x)))


def _init_dcn(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {"offset_conv": init_conv(k1, 3, 3, cin, 18),
            "regular_conv": init_conv(k2, 3, 3, cin, cout, bias=False)}


def _dcn(p, x):
    h, w = x.shape[1:3]
    max_offset = max(h, w) / 4.0
    off = jnp.clip(conv2d(p["offset_conv"], x), -max_offset, max_offset)
    return deform_conv2d(x, off, p["regular_conv"]["w"])


def init_res_block(key, cin, cout, dcn=False):
    k1, k2, k3 = jax.random.split(key, 3)
    if dcn:
        c1, c2 = _init_dcn(k1, cin, cout), _init_dcn(k2, cout, cout)
    else:
        c1 = init_conv(k1, 3, 3, cin, cout, bias=False)
        c2 = init_conv(k2, 3, 3, cout, cout, bias=False)
    return {
        "conv1": c1, "bn1": init_bn(cout),
        "conv2": c2, "bn2": init_bn(cout),
        # upstream: downsample=nn.Conv2d(cin, cout, 1) — biased, unnormed
        "downsample": init_conv(k3, 1, 1, cin, cout),
    }


def res_block(p, x, dcn=False):
    apply1 = _dcn if dcn else conv2d
    y = selu(batch_norm_inference(p["bn1"], apply1(p["conv1"], x)))
    y = batch_norm_inference(p["bn2"], apply1(p["conv2"], y))
    return selu(y + conv2d(p["downsample"], x))


def init_params(rng, c1, c2, c3, c4, dim, K, M):
    keys = jax.random.split(rng, 16)
    q = dim // 4
    return {
        "block1": init_conv_block(keys[0], 3, c1),
        "block2": init_res_block(keys[1], c1, c2),
        "block3": init_res_block(keys[2], c2, c3, dcn=True),
        "block4": init_res_block(keys[3], c3, c4, dcn=True),
        "conv1": init_conv(keys[4], 1, 1, c1, q, bias=False),
        "conv2": init_conv(keys[5], 1, 1, c2, q, bias=False),
        "conv3": init_conv(keys[6], 1, 1, c3, q, bias=False),
        "conv4": init_conv(keys[7], 1, 1, c4, q, bias=False),
        "score_head": {
            "0": init_conv(keys[8], 1, 1, dim, 8, bias=False),
            "2": init_conv(keys[9], 3, 3, 8, 4, bias=False),
            "4": init_conv(keys[10], 3, 3, 4, 4, bias=False),
            "6": init_conv(keys[11], 3, 3, 4, 1, bias=False),
        },
        "desc_head": {
            "offset_conv": {
                "0": init_conv(keys[12], K, K, dim, 2 * M),
                "2": init_conv(keys[13], 1, 1, 2 * M, 2 * M),
            },
            "sf_conv": init_conv(keys[14], 1, 1, dim, dim, bias=False),
            "convM": init_conv(keys[15], 1, 1, dim * M, dim, bias=False),
        },
    }


def load_params(conf):
    sizes = SIZES[conf.get("model_name", "aliked-n16")]
    init = init_params(jax.random.PRNGKey(0), **sizes)
    params, meta = load_params_auto(
        conf.get("model_name", "aliked-n16") + ".pth", init, "aliked")
    meta["head"] = "sddh"
    return params, meta


def backbone(p, x):
    """x: (B, H, W, 3), H,W % 32 == 0 → L2-normalised feature map
    (B, H, W, dim), score map (B, H, W) in (0, 1)."""
    x1 = conv_block(p["block1"], x)                       # 1
    x2 = res_block(p["block2"], avg_pool(x1, 2))          # 1/2
    x3 = res_block(p["block3"], avg_pool(x2, 4), dcn=True)   # 1/8
    x4 = res_block(p["block4"], avg_pool(x3, 4), dcn=True)   # 1/32

    h, w = x.shape[1:3]

    def up(feat):
        return torch_interpolate(feat, (h, w), mode="bilinear",
                                 align_corners=True)

    feats = jnp.concatenate(
        [selu(conv2d(p["conv1"], x1)),
         up(selu(conv2d(p["conv2"], x2))),
         up(selu(conv2d(p["conv3"], x3))),
         up(selu(conv2d(p["conv4"], x4)))], -1)

    sh = p["score_head"]
    s = selu(conv2d(sh["0"], feats))
    s = selu(conv2d(sh["2"], s))
    s = selu(conv2d(sh["4"], s))
    scores = jax.nn.sigmoid(conv2d(sh["6"], s))[..., 0]

    feats = feats / jnp.maximum(
        jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-8)
    return feats, scores


def sddh(params, fmap, kpts, K, M):
    """Sparse Deformable Descriptor Head for all keypoints at once.
    fmap: (H, W, dim) L2-normalised; kpts: (N, 2) xy px → (N, dim)."""
    p = params["desc_head"]
    h, w, dim = fmap.shape
    r = K // 2
    max_offset = max(h, w) / 4.0

    # K×K patches at integer keypoint positions (upstream get_patches
    # on kpts_wh.long()), border-clamped
    dy = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0) - r
    dx = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1) - r
    ix = jnp.clip(kpts[:, 0].astype(jnp.int32)[:, None, None] + dx[None],
                  0, w - 1)
    iy = jnp.clip(kpts[:, 1].astype(jnp.int32)[:, None, None] + dy[None],
                  0, h - 1)
    patches = fmap[iy, ix]                       # (N, K, K, dim)

    # offset_conv: K×K VALID conv ≡ one full-patch contraction, then
    # gate + 1×1 conv; offsets clamp to ±max(h,w)/4 (torch order Δx, Δy
    # interleaved as (N, M, 2) after view)
    w0 = p["offset_conv"]["0"]["w"].reshape(-1, 2 * M)
    off = patches.reshape(len(kpts), -1) @ w0 + p["offset_conv"]["0"]["b"]
    off = selu(off)
    off = off @ p["offset_conv"]["2"]["w"][0, 0] + p["offset_conv"]["2"]["b"]
    off = jnp.clip(off, -max_offset, max_offset).reshape(-1, M, 2)

    sample_xy = kpts[:, None, :] + off           # (N, M, 2) xy px
    samples = nms_ops.sample_bilinear(
        fmap, sample_xy.reshape(-1, 2)).reshape(len(kpts), M, dim)
    samples = selu(jnp.einsum(
        "nmc,cd->nmd", samples, p["sf_conv"]["w"][0, 0],
        preferred_element_type=jnp.float32))
    # upstream flattens C-major: (N, C, n_pos) → (N, C·n_pos), so the
    # convM input channel index is c·M + m
    desc = samples.transpose(0, 2, 1).reshape(len(kpts), dim * M) @ \
        p["convM"]["w"][0, 0]
    return desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)


@functools.partial(
    jax.jit,
    static_argnames=("max_keypoints", "nms_radius", "detection_threshold",
                     "K", "M"),
)
def apply(params, image, valid_wh, max_keypoints=1024, nms_radius=2,
          detection_threshold=0.2, K=3, M=16):
    x = image.transpose(0, 2, 3, 1)
    fmap, heat = backbone(params, x)
    h, w = heat.shape[1:]

    def per_image(scores, f, vwh):
        s = nms_ops.simple_nms(scores, nms_radius)
        s = s * nms_ops.border_mask(h, w, 2, valid_wh=vwh, dtype=s.dtype)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            s, max_keypoints, detection_threshold)
        kpts = nms_ops.soft_argmax_refinement(kpts, scores, radius=2)
        desc = sddh(params, f, kpts, K, M)
        return kpts, kscores, desc.T, mask

    kpts, kscores, desc, mask = jax.vmap(per_image)(heat, fmap, valid_wh)
    return {"keypoints": kpts, "scores": kscores, "descriptors": desc,
            "mask": mask}


@functools.partial(jax.jit, static_argnames=("K", "M"))
def apply_describe(params, image, kpts, K=3, M=16):
    """Describe externally supplied keypoints with the SDDH head
    (the reference third-party ALIKED exposes this as ``describe`` —
    used by extractors/raco.py)."""
    fmap, _ = backbone(params, image.transpose(0, 2, 3, 1))
    return jax.vmap(lambda f, kp: sddh(params, f, kp, K, M).T)(fmap, kpts)


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
        self._K = SIZES[conf["model_name"]]["K"]
        n = conf["max_num_keypoints"]
        self._max_kpts = 4096 if n in (-1, None) else int(n)

    def describe(self, image, kpts, valid_wh=None):
        """(B, 3, H, W), (B, N, 2) → (B, dim, N) SDDH descriptors at the
        given keypoints."""
        image = jnp.asarray(image, jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))
        h, w = image.shape[2:]
        hp, wp = -(-h // 32) * 32, -(-w // 32) * 32
        if (hp, wp) != (h, w):  # /32-aligned for the pool schedule
            image = jnp.pad(image, ((0, 0), (0, 0), (0, hp - h),
                                    (0, wp - w)))
        return apply_describe(self.params, image,
                              jnp.asarray(kpts, jnp.float32),
                              K=self._K, M=self._M)

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))
        b, _, h, w = image.shape
        hp, wp = -(-h // 32) * 32, -(-w // 32) * 32
        if (hp, wp) != (h, w):
            image = jnp.pad(image, ((0, 0), (0, 0), (0, hp - h),
                                    (0, wp - w)))
        if "valid_wh" in data:
            valid_wh = jnp.asarray(data["valid_wh"], jnp.int32)
        else:
            valid_wh = jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))
        return apply(
            self.params, image, valid_wh,
            max_keypoints=self._max_kpts,
            nms_radius=self.conf["nms_radius"],
            detection_threshold=float(self.conf["detection_threshold"]),
            K=self._K, M=self._M,
        )
