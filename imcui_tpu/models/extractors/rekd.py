"""REKD extractor (rotation-equivariant keypoint detection), native JAX.

Reference contract: imcui/hloc/extractors/rekd.py:18-62 — the wrapper runs
third_party/REKD (is_test) producing (keypoints, scores, descriptors 256-d
at coarse resolution) and gates by keypoint_threshold. The published
design uses group-equivariant convolutions over the cyclic rotation group:
each filter is applied at G rotated copies, activations carry an
orientation axis, and the detection score is orientation-invariant (max
over the group) while the descriptor encodes the orientation histogram.

TPU-first: the group axis is folded into the channel axis — a C4 group
conv is a single conv with G·cout output channels built by stacking
`jnp.rot90`-rotated kernels, so the MXU sees one big dense conv instead of
G small ones; the group max / histogram are cheap reshaped reductions.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import conv2d, init_conv, max_pool, relu

GROUP = 4       # C4: 0/90/180/270°
DESC_DIM = 256
CFG = [16, 16, 32, 32]


def _rot_kernel(w, k):
    """Rotate a (kh, kw, cin, cout) kernel spatially by k·90°."""
    return jnp.rot90(w, k=k, axes=(0, 1))


def init_params(rng):
    keys = jax.random.split(rng, len(CFG) + 2)
    params = {"lift": init_conv(keys[0], 5, 5, 1, CFG[0], bias=False),
              "gconv": []}
    cin = CFG[0]
    for k, cout in zip(keys[1:], CFG[1:]):
        # group conv kernel: (kh, kw, G·cin, cout) base; rotations are
        # derived at apply time so equivariance is exact by construction
        params["gconv"].append(
            init_conv(k, 3, 3, GROUP * cin, cout, bias=False))
        cin = cout
    params["desc"] = init_conv(keys[-1], 1, 1, GROUP * CFG[-1], DESC_DIM)
    return params


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("rekd/" + str(conf.get("model_name", "v0")), init, "rekd")


def lift_conv(w, x):
    """Lifting layer: apply the kernel at GROUP rotations →
    (B, H, W, G·cout)."""
    ws = jnp.concatenate([_rot_kernel(w, g) for g in range(GROUP)], -1)
    return conv2d({"w": ws}, x)


def group_conv(w, x, cout):
    """C4 group conv on (B, H, W, G·cin): for output orientation g the
    kernel is rotated by g AND its group-input axis is cyclically shifted
    by g (the regular representation)."""
    cin = x.shape[-1] // GROUP
    outs = []
    for g in range(GROUP):
        wg = _rot_kernel(w, g)
        # cyclic shift of the input-orientation blocks
        wg = wg.reshape(*wg.shape[:2], GROUP, cin, cout)
        wg = jnp.roll(wg, g, axis=2).reshape(*wg.shape[:2], GROUP * cin,
                                             cout)
        outs.append(conv2d({"w": wg}, x))
    return jnp.concatenate(outs, -1)  # (B, H, W, G·cout)


def backbone(params, x):
    x = relu(lift_conv(params["lift"]["w"], x))
    for i, w in enumerate(params["gconv"]):
        cout = CFG[i + 1]
        x = relu(group_conv(w["w"], x, cout))
        if i == 0:
            x = max_pool(x)
    b, h, w_, _ = x.shape
    grouped = x.reshape(b, h, w_, GROUP, CFG[-1])
    # orientation-invariant detection score
    score = grouped.max(3).mean(-1)
    # orientation histogram descriptor (C4-equivariant features flattened)
    desc = conv2d(params["desc"], x)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    return score, desc


@functools.partial(jax.jit, static_argnames=("max_keypoints", "threshold"))
def apply(params, image, valid_wh, max_keypoints=1024, threshold=0.1):
    score, desc_map = backbone(params, image.transpose(0, 2, 3, 1))
    h, w = score.shape[1:]

    def per_image(s, dmap, vwh):
        s = nms_ops.simple_nms(s, 2)
        s = s * nms_ops.border_mask(
            h, w, 2, valid_wh=(vwh + 1) // 2, dtype=s.dtype)
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            s, max_keypoints, 0.0)
        d = nms_ops.sample_descriptors(kpts, dmap.transpose(2, 0, 1), s=1)
        return kpts * 2.0, kscores, d, mask

    kp, sc, d, mask = jax.vmap(per_image)(score, desc_map, valid_wh)
    return {"keypoints": kp, "scores": sc, "descriptors": d, "mask": mask}


class REKD(BaseModel):
    """Reference contract: imcui/hloc/extractors/rekd.py:18."""

    default_conf = {
        "model_name": "v0",
        "keypoint_threshold": 0.1,
        "max_keypoints": 1024,
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 3:
            image = image.mean(1, keepdims=True)
        b, _, h, w = image.shape
        valid_wh = jnp.asarray(
            data.get("valid_wh",
                     jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))),
            jnp.int32)
        return apply(self.params, image, valid_wh,
                     max_keypoints=int(self.conf.get("max_keypoints",
                                                     1024)),
                     threshold=float(self.conf["keypoint_threshold"]))
