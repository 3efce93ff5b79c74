"""RIPE extractor (reinforcement-learned keypoints, VGG hypercolumns),
native JAX.

Reference contract: imcui/hloc/extractors/ripe.py:13-47 — the wrapper runs
third_party/RIPE ``vgg_hyper`` detectAndCompute(threshold, top_k) and cuts
to max_keypoints by score; descriptors are 256-d. The published design: a
VGG backbone whose per-stage activations are upsampled and concatenated
into hypercolumns; a small head turns the hypercolumn into a detection
logit, trained with a reinforcement objective (matches as reward — no
pose/depth supervision); the descriptor is a projection of the same
hypercolumn.

TPU-first: hypercolumn = concat of bilinear-resized stage maps — pure
fused elementwise + resize work; the heads are 1×1 convs (MXU); selection
is the shared masked fixed-k top-k.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import batch_norm_inference, conv2d, init_conv, max_pool, relu

DESC_DIM = 256
STAGES = [(64, 2), (128, 2), (256, 3)]  # (channels, convs) per VGG stage


def init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_params(rng):
    n = sum(k for _, k in STAGES)
    keys = jax.random.split(rng, n + 3)
    params = {"stages": []}
    cin = 3
    ki = 0
    for cout, convs in STAGES:
        stage = []
        for _ in range(convs):
            stage.append({"conv": init_conv(keys[ki], 3, 3, cin, cout,
                                            bias=False),
                          "bn": init_bn(cout)})
            cin = cout
            ki += 1
        params["stages"].append(stage)
    hyper_c = sum(c for c, _ in STAGES)
    params["det"] = [init_conv(keys[ki], 1, 1, hyper_c, 64),
                     init_conv(keys[ki + 1], 1, 1, 64, 1)]
    params["desc"] = init_conv(keys[ki + 2], 1, 1, hyper_c, DESC_DIM)
    return params


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("ripe/" + conf.get("model_name",
                                           "weights_ripe.pth"), init, "ripe")


def backbone(params, x):
    """Hypercolumn at 1/4 resolution → score map + 256-d descriptors."""
    maps = []
    for i, stage in enumerate(params["stages"]):
        for p in stage:
            x = relu(batch_norm_inference(p["bn"], conv2d(p["conv"], x)))
        maps.append(x)
        if i < len(params["stages"]) - 1:
            x = max_pool(x)
    b, ht, wt = maps[1].shape[:3]  # hypercolumn plane: 1/2-stage (=/4 in px)
    hyper = jnp.concatenate(
        [jax.image.resize(m, (b, ht, wt, m.shape[-1]), "bilinear")
         for m in maps], -1)
    score = jax.nn.sigmoid(
        conv2d(params["det"][1], relu(conv2d(params["det"][0], hyper))))
    desc = conv2d(params["desc"], hyper)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    return score[..., 0], desc


@functools.partial(jax.jit, static_argnames=("max_keypoints", "threshold"))
def apply(params, image, valid_wh, max_keypoints=5000, threshold=0.0):
    score, desc_map = backbone(params, image.transpose(0, 2, 3, 1))
    h, w = score.shape[1:]

    def per_image(s, dmap, vwh):
        s = nms_ops.simple_nms(s, 2)
        s = s * nms_ops.border_mask(
            h, w, 2, valid_wh=(vwh + 1) // 2, dtype=s.dtype)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            s, max_keypoints, threshold)
        d = nms_ops.sample_descriptors(kpts, dmap.transpose(2, 0, 1), s=1)
        return kpts * 2.0, kscores, d, mask

    kp, sc, d, mask = jax.vmap(per_image)(score, desc_map, valid_wh)
    return {"keypoints": kp, "scores": sc, "descriptors": d, "mask": mask}


class RIPE(BaseModel):
    """Reference contract: imcui/hloc/extractors/ripe.py:13."""

    default_conf = {
        "keypoint_threshold": 0.05,
        "max_keypoints": 5000,
        "model_name": "weights_ripe.pth",
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))
        b, _, h, w = image.shape
        valid_wh = jnp.asarray(
            data.get("valid_wh",
                     jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))),
            jnp.int32)
        return apply(self.params, image, valid_wh,
                     max_keypoints=int(self.conf["max_keypoints"]),
                     threshold=0.0)
