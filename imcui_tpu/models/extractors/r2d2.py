"""R2D2 extractor (reliable + repeatable detector/descriptor), native JAX.

Re-implementation of the published architecture behind the reference
wrapper (reference: imcui/hloc/extractors/r2d2.py:20 — the r2d2 submodule's
``Quad_L2Net_ConfCFS``): a fully-convolutional dilated L2-Net where the
stride-2 stages are replaced by dilation doubling (output stays full
resolution), the final 8×8 conv is replaced by three dilated 2×2 convs,
batch norms are affine-free (running stats only), and two heads consume
the SQUARED descriptor map: ``clf`` (2-ch reliability, softmax → ch 1) and
``sal`` (1-ch repeatability through the softplus ratio sp/(1+sp) — the
upstream ``softmax`` helper for 1-channel inputs, NOT a sigmoid).

Parameter tree mirrors the upstream ``ops.{i}`` ModuleList indices (convs
at 0,3,6,9,12,15 with BN at +1 and parameter-free ReLU slots, then the
2×2 convs at 18/20/22 with BN at 19/21) so ``r2d2_WASF_N16.pt`` converts
mechanically via the rank-based engine.

TPU-first: the whole net is dense dilated conv work at full resolution;
selection is the upstream equality-NMS (3×3 max-filter) with the
reliability/repeatability thresholds as mask rules and score =
reliability × repeatability, fixed-k masked top-k. Single-scale (the
reference wrapper's ``extract_multiscale`` pyramid is a host loop over
resizes; our operating point runs the native resolution — documented
scope note, does not affect weight mapping).
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import batch_norm_inference, conv2d, init_conv

# (conv_idx, bn_idx, relu, k, cin, cout, dilation) — upstream PatchNet
# ``ops`` ModuleList layout for Quad_L2Net (mchan=4, dim=128, dilated):
# stride-2 requests become dilation doubling AFTER the conv is applied.
OPS_SPEC = [
    (0, 1, True, 3, 3, 32, 1),
    (3, 4, True, 3, 32, 32, 1),
    (6, 7, True, 3, 32, 64, 1),      # "stride 2" → dilation *= 2
    (9, 10, True, 3, 64, 64, 2),
    (12, 13, True, 3, 64, 128, 2),   # dilation *= 2
    (15, 16, True, 3, 128, 128, 4),
    (18, 19, False, 2, 128, 128, 4),  # 2×2 tail, dilation *= 2 each
    (20, 21, False, 2, 128, 128, 8),
    (22, None, False, 2, 128, 128, 16),
]
N_OPS = 23

# ImageNet normalisation the reference wrapper applies before the net
# (imcui/hloc/extractors/r2d2.py norm_rgb).
_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


def init_bn(c):
    # upstream BatchNorm2d(affine=False): running stats only
    return {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_params(rng):
    keys = jax.random.split(rng, len(OPS_SPEC) + 2)
    ops = [None] * N_OPS
    for key, (ci, bi, _, k, cin, cout, _d) in zip(keys, OPS_SPEC):
        ops[ci] = init_conv(key, k, k, cin, cout)
        if bi is not None:
            ops[bi] = init_bn(cout)
    return {"ops": ops,
            "clf": init_conv(keys[-2], 1, 1, 128, 2),
            "sal": init_conv(keys[-1], 1, 1, 128, 1)}


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto(
        conf.get("model_name", "r2d2_WASF_N16.pt"), init, "r2d2")


def backbone(params, x):
    """x: (B, H, W, 3), ImageNet-normalised. Returns (desc (B,H,W,128),
    reliability (B,H,W), repeatability (B,H,W)) — upstream forward_one."""
    for ci, bi, rl, _k, _cin, _cout, dil in OPS_SPEC:
        x = conv2d(params["ops"][ci], x, dilation=dil)
        if bi is not None:
            x = batch_norm_inference(params["ops"][bi], x)
        if rl:
            x = jnp.maximum(x, 0)
    desc = x / jnp.maximum(
        jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
    x2 = x * x  # heads consume the squared features (upstream clf(x**2))
    reliability = jax.nn.softmax(conv2d(params["clf"], x2), -1)[..., 1]
    # upstream 1-channel "softmax": softplus ratio sp/(1+sp), not sigmoid
    sp = jax.nn.softplus(conv2d(params["sal"], x2))[..., 0]
    repeatability = sp / (1.0 + sp)
    return desc, reliability, repeatability


@functools.partial(
    jax.jit,
    static_argnames=("max_keypoints", "reliability_threshold",
                     "repeatability_threshold"),
)
def apply(params, image, valid_wh, max_keypoints=4096,
          reliability_threshold=0.7, repeatability_threshold=0.7):
    x = image.transpose(0, 2, 3, 1)
    x = (x - jnp.asarray(_MEAN)) / jnp.asarray(_STD)
    desc_map, rel, rep = backbone(params, x)
    h, w = rep.shape[1:]

    def per_image(rel_i, rep_i, dmap, vwh):
        # upstream NonMaxSuppression: repeatability equals its 3×3 max
        # filter AND both thresholds hold; rank by rel × rep
        maxima = (rep_i == nms_ops.max_pool_2d(rep_i, 1)) \
            & (rep_i >= repeatability_threshold) \
            & (rel_i >= reliability_threshold)
        s = jnp.where(maxima, rel_i * rep_i, 0.0)
        s = s * nms_ops.border_mask(h, w, 4, valid_wh=vwh, dtype=s.dtype)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            s, max_keypoints, 0.0)
        ix = jnp.clip(kpts[:, 0].astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(kpts[:, 1].astype(jnp.int32), 0, h - 1)
        d = dmap[iy, ix]
        return kpts, kscores, d.T, mask

    kpts, kscores, desc, mask = jax.vmap(per_image)(rel, rep, desc_map,
                                                    valid_wh)
    return {"keypoints": kpts, "scores": kscores, "descriptors": desc,
            "mask": mask}


class R2D2(BaseModel):
    """Reference contract: imcui/hloc/extractors/r2d2.py:20."""

    default_conf = {
        "model_name": "r2d2_WASF_N16.pt",
        "max_keypoints": 5000,
        "scale_factor": 2**0.25,
        "min_size": 256,
        "max_size": 1024,
        "min_scale": 0,
        "max_scale": 1,
        "reliability_threshold": 0.7,
        "repetability_threshold": 0.7,
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        if conf["max_keypoints"] in (-1, None):
            conf["max_keypoints"] = 5000

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))
        b, _, h, w = image.shape
        valid_wh = jnp.asarray(
            data.get("valid_wh",
                     jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))),
            jnp.int32,
        )
        return apply(
            self.params, image, valid_wh,
            max_keypoints=self.conf["max_keypoints"],
            reliability_threshold=float(
                self.conf["reliability_threshold"]),
            repeatability_threshold=float(
                self.conf["repetability_threshold"]),
        )
