"""D2-Net detect-and-describe extractor, native JAX/XLA.

Re-implementation of the architecture behind the reference wrapper
(reference: imcui/hloc/extractors/d2net.py:15 — the d2net submodule:
VGG16 features truncated at conv4_3 (dense 512-d descriptors at 1/8 after
three pools... the published model truncates after conv4_3 with pools at
1/2, 1/4), detection = joint channel-and-spatial soft local maxima over
the feature map: a location is a keypoint where some channel is both the
local spatial maximum and the per-pixel channel maximum).

TPU-first: detection scores = channel-softmax × spatial soft-NMS computed
as dense map ops; fixed-k masked selection; descriptors are the feature
vectors at the detected cells, L2-normalised, upsampled cell coords →
image coords.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import conv2d, init_conv, max_pool, relu

# VGG16 through conv4_3, the d2net dense extractor layout
# (upstream model_test.py DenseFeatureExtractionModule: two stride-2 max
# pools, then a STRIDE-1 avg pool with dilation-2 conv4 — dense features
# at 1/4 resolution). Entries mirror the torch Sequential indices so the
# checkpoint's `dense_feature_extraction.model.{i}.*` keys land by index.
VGG_CFG = [
    (3, 64, 1), (64, 64, 1), "maxpool",
    (64, 128, 1), (128, 128, 1), "maxpool",
    (128, 256, 1), (256, 256, 1), (256, 256, 1), "avgpool1",
    (256, 512, 2), (512, 512, 2), (512, 512, 2),
]
STRIDE = 4  # output stride (two stride-2 pools)


def init_params(rng):
    keys = jax.random.split(rng, 16)
    params = {"features": []}
    ki = 0
    for spec in VGG_CFG:
        if isinstance(spec, str):
            params["features"].append(None)
        else:
            cin, cout, _ = spec
            params["features"].append(init_conv(keys[ki], 3, 3, cin, cout))
            ki += 1
    return params


# upstream Sequential index (convs interleaved with ReLU/pool modules)
# → our features-list slot
_UPSTREAM_IDX = {0: 0, 2: 1, 5: 3, 7: 4, 10: 6, 12: 7, 14: 8,
                 17: 10, 19: 11, 21: 12}


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    rename = tuple(
        (rf"^dense_feature_extraction\.model\.{u}\.", f"features.{o}.")
        for u, o in _UPSTREAM_IDX.items()
    )
    return load_params_auto("d2_tf.pth", init, "d2net", rename=rename)


def avg_pool_s1(x):
    """AvgPool2d(2, stride=1) with SAME-ish padding (torch pads none;
    output is one smaller — we replicate-pad one row/col to keep the
    static shape XLA-friendly; the border cell matches torch's last
    valid window closely enough for detection)."""
    y = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 1, 1, 1),
        [(0, 0), (0, 1), (0, 1), (0, 0)]) / 4.0
    return y


def backbone(params, x):
    for p, spec in zip(params["features"], VGG_CFG):
        if spec == "maxpool":
            x = max_pool(x)
        elif spec == "avgpool1":
            x = avg_pool_s1(x)
        else:
            x = relu(conv2d(p, x, dilation=spec[2]))
    return x  # (B, H/4, W/4, 512)


def d2_scores(feats, eps=1e-8):
    """D2-Net soft detection (upstream lib/model_test.py
    SoftDetectionModule, pinned by tests/test_torch_parity3.py):
    features are ReLU'd, α = exp(x/M) / Σ_{3×3} exp(x/M) with the window
    sum padded by exp(0)=1 at the borders and M the per-sample global
    max, β = x / channelwise-max, score = max_c(α·β) normalised to sum 1
    over the map."""
    feats = jnp.maximum(feats, 0.0)
    m = feats.max((1, 2, 3), keepdims=True)
    exp = jnp.exp(feats / jnp.maximum(m, eps))
    # border padding contributes exp(0)=1 per out-of-map tap
    window_sum = jax.lax.reduce_window(
        exp - 1.0, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    ) + 9.0
    alpha = exp / window_sum
    beta = feats / jnp.maximum(feats.max(-1, keepdims=True), eps)
    gamma = (alpha * beta).max(-1)  # (B, Hc, Wc)
    return gamma / (gamma.sum((1, 2), keepdims=True) + eps)


@functools.partial(jax.jit, static_argnames=("max_keypoints",))
def apply(params, image, valid_wh, max_keypoints=4096):
    x = image.transpose(0, 2, 3, 1)
    feats = backbone(params, x)
    scores = d2_scores(feats)
    hc, wc = scores.shape[1:]

    def per_image(s, fmap, vwh):
        s = nms_ops.simple_nms(s, 1)
        s = s * nms_ops.border_mask(
            hc, wc, 1, valid_wh=(vwh[0] // STRIDE, vwh[1] // STRIDE),
            dtype=s.dtype)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            s, max_keypoints, 0.0)
        ix = jnp.clip(kpts[:, 0].astype(jnp.int32), 0, wc - 1)
        iy = jnp.clip(kpts[:, 1].astype(jnp.int32), 0, hc - 1)
        d = fmap[iy, ix]
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                            1e-8)
        # cell → image coords (d2net upscale: ij·s + (s-1)/2)
        kpts_img = kpts * float(STRIDE) + (STRIDE - 1) / 2.0
        return kpts_img, kscores, d.T, mask

    kpts, kscores, desc, mask = jax.vmap(per_image)(scores, feats,
                                                    valid_wh)
    return {"keypoints": kpts, "scores": kscores, "descriptors": desc,
            "mask": mask}


class D2Net(BaseModel):
    """Reference contract: imcui/hloc/extractors/d2net.py:15."""

    default_conf = {
        "model_name": "d2_tf.pth",
        "checkpoint_dir": None,
        "use_relu": True,
        "multiscale": False,
        "max_keypoints": 4096,
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        if conf["max_keypoints"] in (-1, None):
            conf["max_keypoints"] = 4096

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))  # d2net is RGB
        b, _, h, w = image.shape
        hp, wp = -(-h // 4) * 4, -(-w // 4) * 4
        if (hp, wp) != (h, w):
            image = jnp.pad(image, ((0, 0), (0, 0), (0, hp - h),
                                    (0, wp - w)))
        valid_wh = jnp.asarray(
            data.get("valid_wh",
                     jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))),
            jnp.int32,
        )
        return apply(self.params, image, valid_wh,
                     max_keypoints=self.conf["max_keypoints"])
