"""Warp-regression dense matcher (RoMa/DKM family contract).

Reference contract: imcui/hloc/matchers/roma.py:17-94 and dkm.py:13 —
``match()`` produces a dense warp + certainty field, ``sample()`` draws
``max_keypoints`` correspondences, ``to_pixel_coordinates`` maps the
normalised warp to pixels; the wrapper flattens that into the standalone
dense-matcher output {keypoints0, keypoints1, mconf}.

Architecture note (honest scope): the upstream RoMa couples a DINOv2-L
encoder with Gaussian-Process coarse matching and ConvNet refiners; DKM
uses a GP warp regressor over ResNet features. This implementation keeps
the *warp-regression structure* — coarse correlation-volume soft-argmax
warp + certainty, convolutional warp refinement, full-res upsampling,
certainty-weighted sampling — on the framework's ResNet-FPN features. It
is a functioning dense warp matcher with the same I/O and sampling
semantics; DINOv2 weight conversion is future work and the conf records
``backbone: "fpn-corr"`` to make the substitution explicit.
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ..layers import conv2d, init_conv, relu
from . import loftr as loftr_mod


def init_params(rng):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "backbone": loftr_mod.init_backbone(k1),
        "refiner": {
            # input: [feat0 (256), warped feat1 (256), warp (2), cert (1)]
            "conv1": init_conv(k2, 3, 3, 515, 256),
            "conv2": init_conv(k3, 3, 3, 256, 128),
            "out": init_conv(k4, 3, 3, 128, 3),  # dwarp (2) + dcert (1)
        },
    }


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return init, {"pretrained": False, "backbone": "fpn-corr"}


def correlation_warp(f0, f1, temperature=0.05):
    """Coarse warp by soft-argmax over the correlation volume.

    f0/f1: (Hc, Wc, D) → warp (Hc, Wc, 2) in normalised [-1, 1] coords of
    image1, certainty (Hc, Wc)."""
    hc, wc, d = f0.shape
    a = f0.reshape(-1, d)
    b = f1.reshape(-1, d)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-8)
    sim = jnp.einsum("nd,md->nm", a, b,
                     preferred_element_type=jnp.float32) / temperature
    attn = jax.nn.softmax(sim, -1)  # (N0, N1)
    gy, gx = jnp.meshgrid(
        (jnp.arange(hc) + 0.5) / hc * 2 - 1,
        (jnp.arange(wc) + 0.5) / wc * 2 - 1,
        indexing="ij",
    )
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (N1, 2)
    warp = attn @ grid  # expected target coords
    certainty = jnp.max(attn, -1)  # peakiness as confidence
    return warp.reshape(hc, wc, 2), certainty.reshape(hc, wc)


def bilinear_warp(feat, warp):
    """Sample feat (Hc, Wc, D) at normalised warp coords (Hc, Wc, 2)."""
    hc, wc, d = feat.shape
    gx = (warp[..., 0] + 1) * 0.5 * (wc - 1)
    gy = (warp[..., 1] + 1) * 0.5 * (hc - 1)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, wc - 1)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, hc - 1)
    x1 = jnp.clip(x0 + 1, 0, wc - 1)
    y1 = jnp.clip(y0 + 1, 0, hc - 1)
    wx = jnp.clip(gx - x0, 0, 1)[..., None]
    wy = jnp.clip(gy - y0, 0, 1)[..., None]
    out = (
        feat[y0, x0] * (1 - wx) * (1 - wy)
        + feat[y0, x1] * wx * (1 - wy)
        + feat[y1, x0] * (1 - wx) * wy
        + feat[y1, x1] * wx * wy
    )
    return out


def refine(params, f0, f1, warp, cert):
    """One conv refinement step on [f0, warp(f1), warp, cert]."""
    warped = bilinear_warp(f1, warp)
    inp = jnp.concatenate(
        [f0, warped, warp, cert[..., None]], -1
    )[None]
    x = relu(conv2d(params["conv1"], inp))
    x = relu(conv2d(params["conv2"], x))
    out = conv2d(params["out"], x)[0]
    return warp + 0.1 * jnp.tanh(out[..., :2]), \
        jax.nn.sigmoid(out[..., 2]) * cert


def match(params, image0, image1):
    """Dense warp + certainty at 1/8 resolution (the reference's
    roma.match analog)."""
    featc, _ = loftr_mod.backbone_apply(
        params["backbone"], jnp.stack([image0, image1], 0))
    f0, f1 = featc[0], featc[1]
    warp, cert = correlation_warp(f0, f1)
    warp, cert = refine(params["refiner"], f0, f1, warp, cert)
    return warp, cert


def to_pixel_coordinates(warp_coords, h, w):
    """Normalised [-1, 1] → pixel coords (reference parity:
    matchers/roma.py:82-87)."""
    return jnp.stack(
        [(warp_coords[..., 0] + 1) * 0.5 * (w - 1),
         (warp_coords[..., 1] + 1) * 0.5 * (h - 1)], -1,
    )


def sample(warp, cert, h, w, num=2048):
    """Draw the top-``num`` correspondences by certainty (the reference's
    roma.sample analog, deterministic top-k instead of multinomial)."""
    hc, wc = cert.shape
    gy, gx = jnp.meshgrid(jnp.arange(hc), jnp.arange(wc), indexing="ij")
    # source pixel coords at full res (cell centers, stride 8)
    k0 = jnp.stack(
        [gx.reshape(-1) * 8.0 + 4.0, gy.reshape(-1) * 8.0 + 4.0], -1)
    k1 = to_pixel_coordinates(warp.reshape(-1, 2), h, w)
    flat_cert = cert.reshape(-1)
    top, idx = jax.lax.top_k(flat_cert, min(num, flat_cert.shape[0]))
    valid = top > 0.0
    return (jnp.where(valid[:, None], k0[idx], 0.0),
            jnp.where(valid[:, None], k1[idx], 0.0),
            jnp.where(valid, top, 0.0), valid)


@functools.partial(jax.jit, static_argnames=("max_matches",))
def _apply_batched(params, image0, image1, max_matches):
    def per_pair(a, b):
        warp, cert = match(params, a, b)
        h, w = a.shape[0], a.shape[1]
        k0, k1, score, valid = sample(warp, cert, h, w, num=max_matches)
        return {"keypoints0": k0, "keypoints1": k1, "scores": score,
                "mask": valid}

    return jax.vmap(per_pair)(image0, image1)


class Roma(BaseModel):
    """Reference contract: imcui/hloc/matchers/roma.py:17-94 — standalone
    dense warp matcher."""

    default_conf = {
        "model_name": "roma_outdoor.pth",
        "max_keypoints": 2048,
        "backbone": "fpn-corr",  # DINOv2 conversion pending — see module doc
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)

    def _forward(self, data):
        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)

        def prep(img):
            x = img.transpose(0, 2, 3, 1)
            if x.shape[-1] == 3:
                x = x.mean(-1, keepdims=True)
            return x

        out = _apply_batched(self.params, prep(image0), prep(image1),
                             int(self.conf["max_keypoints"]))
        out["mconf"] = out["scores"]
        return out

