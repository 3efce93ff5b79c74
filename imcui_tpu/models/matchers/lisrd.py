"""LISRD invariance-selective matcher, native JAX/XLA.

Reference contract: imcui/hloc/matchers/lisrd.py:157 (the largest in-repo
wrapper — its meta-weighted matching logic lives in the wrapper itself and
is reproduced faithfully here): LISRD computes FOUR descriptors per point
(rotation variant/invariant × illumination variant/invariant) plus four
meta-descriptors; at match time the meta-descriptor similarities softmax
into weights that select the best invariance per candidate pair
(reference: lisrd.py:122-151 _lisrd_matcher / _compute_confidence).

The descriptor network (shared VGG trunk → 4 descriptor heads + 4
meta-descriptor heads at 1/8 resolution) is rebuilt from the published
design; a configurable detector (superpoint / aliked / sift) supplies the
keypoints, exactly as the wrapper does (lisrd.py:46-69).

TPU-first: all four invariances are sampled and matched in one
(N, 4, D)×(M, 4, D) einsum pipeline — the invariance axis rides along for
free on the MXU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.nms import sample_descriptors
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import conv2d, init_conv, max_pool, relu

VARIANCES = ("rot_var_illum_var", "rot_var_illum_inv",
             "rot_inv_illum_var", "rot_inv_illum_inv")
DESC_SIZE = 128
META_DESC_DIM = 128


def init_params(rng):
    keys = jax.random.split(rng, 16)
    ki = 0
    params = {"trunk": []}
    cin = 3
    for cout in (64, 64, 128, 128, 256, 256):
        params["trunk"].append(init_conv(keys[ki], 3, 3, cin, cout))
        ki += 1
        cin = cout
    for v in VARIANCES:
        params[f"desc_{v}"] = init_conv(keys[ki], 1, 1, 256, DESC_SIZE)
        ki += 1
    k2 = jax.random.split(keys[ki], len(VARIANCES))
    for v, k in zip(VARIANCES, k2):
        params[f"meta_{v}"] = init_conv(k, 1, 1, 256, META_DESC_DIM)
    return params


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto(conf.get("model_name", "lisrd_aachen") + ".pth", init, "lisrd")


def backbone(params, x):
    """x: (B, H, W, 3) → descs (B, Hc, Wc, 4, D), metas (B, Hc, Wc, 4, Dm)
    at 1/4 resolution."""
    for i, p in enumerate(params["trunk"]):
        x = relu(conv2d(p, x))
        if i in (1, 3):  # two pools → 1/4
            x = max_pool(x)
    descs = jnp.stack(
        [conv2d(params[f"desc_{v}"], x) for v in VARIANCES], -2)
    metas = jnp.stack(
        [conv2d(params[f"meta_{v}"], x) for v in VARIANCES], -2)
    return descs, metas


def normalize(x, axis=-1, eps=1e-8):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True),
                           eps)


def lisrd_match(desc0, desc1, meta0, meta1, mask0, mask1):
    """Meta-weighted mutual-NN matching (reference parity:
    lisrd.py:122-151). desc*: (N, 4, D); meta*: (N, 4, Dm).
    Returns matches0 (N,), scores0 (N,)."""
    desc0 = normalize(desc0)
    desc1 = normalize(desc1)
    meta0 = normalize(meta0)
    meta1 = normalize(meta1)
    # per-invariance weights from meta similarity, softmaxed over the
    # invariance axis
    meta_sims = jnp.einsum("nid,mid->nim", meta0, meta1,
                           preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(meta_sims, axis=1)
    desc_sims = jnp.einsum("nid,mid->nim", desc0, desc1,
                           preferred_element_type=jnp.float32)
    sims = (desc_sims * weights).sum(1)  # (N, M)
    sims = jnp.where(mask0[:, None] & mask1[None, :], sims, -1e9)

    nn01 = jnp.argmax(sims, 1)
    nn10 = jnp.argmax(sims, 0)
    mutual = jnp.arange(sims.shape[0]) == jnp.take(nn10, nn01)
    scores = jnp.max(sims, 1)
    valid = mutual & mask0 & (scores > -1e8)
    # the reference reports the raw weighted cosine as mconf
    # (lisrd.py:137-149 _compute_confidence) — no [0,1] rescale
    return (jnp.where(valid, nn01, -1).astype(jnp.int32),
            jnp.where(valid, scores, 0.0))


@functools.partial(jax.jit, static_argnames=())
def _describe(params, images, kpts):
    """images: (B, 3, H, W); kpts: (B, N, 2) → descs (B, N, 4, D),
    metas (B, N, 4, Dm)."""
    x = images.transpose(0, 2, 3, 1)
    descs, metas = backbone(params, x)

    def per_image(dmap, mmap, kp):
        # (Hc, Wc, 4, D) → sample each invariance at the keypoints
        outs_d = []
        outs_m = []
        for i in range(len(VARIANCES)):
            outs_d.append(sample_descriptors(
                kp, dmap[..., i, :].transpose(2, 0, 1), s=4).T)
            outs_m.append(sample_descriptors(
                kp, mmap[..., i, :].transpose(2, 0, 1), s=4).T)
        return jnp.stack(outs_d, 1), jnp.stack(outs_m, 1)

    return jax.vmap(per_image)(descs, metas, kpts)


class Lisrd(BaseModel):
    """Reference contract: imcui/hloc/matchers/lisrd.py — standalone
    matcher {image0, image1} → matched correspondences, detector
    configurable (superpoint | aliked | sift)."""

    default_conf = {
        "model_name": "lisrd_aachen",
        "max_keypoints": 2048,
        "detector": "superpoint",
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        det = conf["detector"]
        if det == "superpoint":
            from ..extractors.superpoint import SuperPoint

            self.detector = SuperPoint({
                "max_keypoints": conf["max_keypoints"],
                "keypoint_threshold": 0.005,
            })
        elif det == "aliked":
            from ..extractors.aliked import ALIKED

            self.detector = ALIKED({
                "max_num_keypoints": conf["max_keypoints"],
            })
        elif det == "sift":
            from ..extractors.sift import SIFT

            self.detector = SIFT({"max_keypoints": conf["max_keypoints"]})
        else:
            raise ValueError(f"Unknown detector {det}")

    def _forward(self, data):
        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)

        def gray(img):
            return img.mean(1, keepdims=True) if img.shape[1] == 3 else img

        def rgb(img):
            return jnp.tile(img, (1, 3, 1, 1)) if img.shape[1] == 1 else img

        f0 = self.detector({"image": np.asarray(gray(image0))})
        f1 = self.detector({"image": np.asarray(gray(image1))})
        k0 = jnp.asarray(f0["keypoints"], jnp.float32)
        k1 = jnp.asarray(f1["keypoints"], jnp.float32)
        d0, m0 = _describe(self.params, rgb(image0), k0)
        d1, m1 = _describe(self.params, rgb(image1), k1)

        matches, scores = jax.vmap(lisrd_match)(
            d0, d1, m0, m1,
            jnp.asarray(f0["mask"], bool), jnp.asarray(f1["mask"], bool),
        )
        ok = matches > -1
        idx = jnp.clip(matches, 0, k1.shape[1] - 1)
        k1m = jax.vmap(lambda kk, ii: jnp.take(kk, ii, axis=0))(k1, idx)
        return {
            "keypoints0": jnp.where(ok[..., None], k0, 0.0),
            "keypoints1": jnp.where(ok[..., None], k1m, 0.0),
            "scores": jnp.where(ok, scores, 0.0),
            "mconf": jnp.where(ok, scores, 0.0),
            "mask": ok,
        }
