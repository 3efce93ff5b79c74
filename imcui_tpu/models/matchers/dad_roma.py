"""DaD + RoMa matcher (detector-anchored dense warp), native JAX.

Reference contract: imcui/hloc/matchers/dad_roma.py:22-90 — standalone
matcher combining the DaD keypoint detector with RoMa's dense warp: DaD
detects up to max_keypoints well-localised keypoints in BOTH images, the
RoMa warp transports image0's keypoints into image1, and each transported
point snaps to the nearest detected image1 keypoint (detector-anchored
matches are much better localised than raw warp samples).

TPU-first: the snap is a fixed-shape (N0, N1) distance matmul + argmin
with a radius gate; the detector here is the warp certainty's local
maxima (DaD trains a detector to pick warp-consistent points — its
inference-time effect) refined by soft-argmax.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ..layers import vmap_pairs
from . import roma as roma_mod

SNAP_RADIUS = 8.0  # px


def load_params(conf):
    return roma_mod.load_params(conf)


@functools.partial(jax.jit, static_argnames=("max_matches",))
def _apply_batched(params, image0, image1, max_matches):
    def per_pair(a, b):
        warp01, cert01 = roma_mod.match(params, a, b)
        warp10, cert10 = roma_mod.match(params, b, a)
        h, w = a.shape[0], a.shape[1]
        # warp grid stride: 8 on the fpn-corr fallback, 1 on the full
        # DINOv2+GP RoMa (whose refiners go to stride 1)
        stride = h // cert01.shape[0]
        off = stride / 2.0 if stride > 1 else 0.0

        def detect(cert):
            s = nms_ops.simple_nms(cert, 2)
            kpts, kscores, mask = nms_ops.select_topk_keypoints(
                s, max_matches, 0.0)
            kpts = (nms_ops.soft_argmax_refinement(kpts, cert) * stride
                    + off)
            kpts = jnp.clip(kpts, 0.0,
                            jnp.asarray([w - 1.0, h - 1.0], kpts.dtype))
            return kpts, kscores, mask

        k0, s0, m0 = detect(cert01)
        k1, s1, m1 = detect(cert10)

        # transport k0 through the warp: bilinear-sample the warp field
        # at k0's (float) grid coordinates
        k0c = (k0 - off) / stride
        hc, wc = cert01.shape
        x = jnp.clip(k0c[:, 0], 0.0, wc - 1.001)
        y = jnp.clip(k0c[:, 1], 0.0, hc - 1.001)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[:, None]
        fy = (y - y0)[:, None]
        wfield = warp01
        wq = (wfield[y0, x0] * (1 - fx) * (1 - fy)
              + wfield[y0, x0 + 1] * fx * (1 - fy)
              + wfield[y0 + 1, x0] * (1 - fx) * fy
              + wfield[y0 + 1, x0 + 1] * fx * fy)
        k0_in_1 = roma_mod.to_pixel_coordinates(wq, h, w)  # (N, 2)

        # snap to the nearest detected keypoint in image1
        d2 = ((k0_in_1[:, None] - k1[None]) ** 2).sum(-1)
        d2 = jnp.where(m1[None, :], d2, 1e18)
        nn = jnp.argmin(d2, 1)
        dist = jnp.sqrt(jnp.take_along_axis(d2, nn[:, None], 1)[:, 0])
        snapped = jnp.take(k1, nn, axis=0)
        anchored = dist < SNAP_RADIUS
        k1_final = jnp.where(anchored[:, None], snapped, k0_in_1)

        cx = jnp.clip(x0, 0, wc - 1)
        cy = jnp.clip(y0, 0, hc - 1)
        conf = cert01[cy, cx] * jnp.where(anchored, 1.0, 0.5)
        valid = m0 & (conf > 0.0)
        return {"keypoints0": jnp.where(valid[:, None], k0, 0.0),
                "keypoints1": jnp.where(valid[:, None], k1_final, 0.0),
                "scores": jnp.where(valid, conf, 0.0), "mask": valid}

    return vmap_pairs(per_pair)(image0, image1)


class DadRoma(BaseModel):
    """Reference contract: imcui/hloc/matchers/dad_roma.py:22."""

    default_conf = {
        "name": "two_view_pipeline",
        "model_name": "roma_outdoor.pth",
        "model_utils_name": "dinov2_vitl14_pretrain.pth",
        "max_keypoints": 3000,
        "coarse_res": (560, 560),
        "upsample_res": (864, 1152),
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)

    def _forward(self, data):
        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)
        gp = "dinov2" in self.params

        def prep(img):
            x = img.transpose(0, 2, 3, 1)
            if gp:  # full RoMa: RGB at coarse_res (/14-divisible)
                if x.shape[-1] == 1:
                    x = jnp.tile(x, (1, 1, 1, 3))
                ch, cw = self.conf["coarse_res"]
                x = jax.image.resize(x, (x.shape[0], ch, cw, 3), "bilinear")
            elif x.shape[-1] == 3:
                x = x.mean(-1, keepdims=True)
            return x

        out = _apply_batched(self.params, prep(image0), prep(image1),
                             int(self.conf["max_keypoints"]))
        if gp:  # coarse_res pixels → model-input pixels
            h0, w0 = image0.shape[-2:]
            h1, w1 = image1.shape[-2:]
            ch, cw = self.conf["coarse_res"]
            out = dict(out)
            out["keypoints0"] = out["keypoints0"] * jnp.asarray(
                [(w0 - 1) / (cw - 1), (h0 - 1) / (ch - 1)])
            out["keypoints1"] = out["keypoints1"] * jnp.asarray(
                [(w1 - 1) / (cw - 1), (h1 - 1) / (ch - 1)])
        out["mconf"] = out["scores"]
        return out
