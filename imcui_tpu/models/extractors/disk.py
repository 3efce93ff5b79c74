"""DISK keypoint detector + descriptor, native JAX/XLA.

Re-implementation of the architecture behind the reference wrapper
(reference: imcui/hloc/extractors/disk.py:8-37, which wraps kornia's DISK
``from_pretrained("depth")`` — rebuilt from the published DISK design: a
thin U-Net, 5 down stages [16, 32, 64, 64, 64] / 3 up stages
[64, 64, 129], 5×5 convs with PReLU gates and instance norm, producing a
128-d dense descriptor map + 1 detection heatmap; window-5 NMS keypoint
selection).

Conversion note: the exact kornia parameter naming is validated on first
checkpoint availability (offline here); the conversion path errors cleanly
into random init when names mismatch.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import download_checkpoint, load_state_dict
from ..layers import conv2d, init_conv

DOWN = [16, 32, 64, 64, 64]
UP = [64, 64, 64, 129]  # 4 up stages mirror the 4 pools → full-res output
DESC_DIM = 128


def instance_norm(x, eps=1e-5):
    """Parameter-free instance norm over spatial dims. x: (B, H, W, C)."""
    mean = x.mean((1, 2), keepdims=True)
    var = ((x - mean) ** 2).mean((1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def prelu(p, x):
    return jnp.where(x >= 0, x, p["alpha"] * x)


def init_gate(c):
    return {"alpha": jnp.full((c,), 0.25, jnp.float32)}


def init_params(rng):
    keys = jax.random.split(rng, 16)
    params = {"down": [], "up": []}
    cin = 3
    ki = 0
    for i, cout in enumerate(DOWN):
        params["down"].append({
            "conv": init_conv(keys[ki], 5, 5, cin, cout),
            "gate": init_gate(cout),
        })
        ki += 1
        cin = cout
    # up stage i consumes cat(upsampled, skip from down[-2 - i])
    skip_dims = DOWN[-2::-1]  # [64, 64, 32, 16]
    cin = DOWN[-1]
    for i, cout in enumerate(UP):
        params["up"].append({
            "conv": init_conv(keys[ki], 5, 5, cin + skip_dims[i], cout),
            "gate": init_gate(cout) if i < len(UP) - 1 else None,
        })
        ki += 1
        cin = cout
    return params


def load_params(conf):
    """Order-based conversion: the official/kornia unet state_dict is
    consumed positionally (insertion order is topological in torch), so
    the exact module names don't matter. A present-but-mismatched
    checkpoint raises — no silent random fallback."""
    init = init_params(jax.random.PRNGKey(0))
    path = download_checkpoint("disk_depth.pth")
    if path is None:
        return init, {"pretrained": False}
    sd = load_state_dict(path)
    tree = _convert(sd, init)
    return tree, {"pretrained": True}


def _convert(sd, init):
    """Map the unet state_dict onto our down/up lists by matching conv
    kernels and PReLU gains in order. torch PReLU stores its per-channel
    gain as a 1-D ``weight``; InstanceNorm2d here is affine-free, so the
    1-D weights in the file are exactly the gate alphas."""
    import numpy as np

    convs = [
        (k, v) for k, v in sd.items() if v.ndim == 4 and k.endswith("weight")
    ]
    biases = {k[:-6] + "bias": sd.get(k[:-6] + "bias") for k, _ in convs}
    alphas = [v for k, v in sd.items()
              if v.ndim == 1 and k.endswith("weight")]
    tree = jax.tree_util.tree_map(lambda a: a, init)
    stages = tree["down"] + tree["up"]
    n_gates = sum(1 for s in stages if s["gate"] is not None)
    if len(convs) < len(stages):
        raise ValueError(
            f"DISK conversion: {len(convs)} convs for {len(stages)} stages")
    ci = ai = 0
    for stage in stages:
        name, w = convs[ci]
        expected = stage["conv"]["w"].shape
        got = np.transpose(w, (2, 3, 1, 0)).shape
        if expected != got:
            raise ValueError(f"DISK conversion mismatch {expected} vs {got}")
        stage["conv"]["w"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
        b = biases.get(name[:-6] + "bias")
        if b is not None:
            stage["conv"]["b"] = jnp.asarray(b)
        ci += 1
        if stage["gate"] is not None and ai < len(alphas):
            a = np.asarray(alphas[ai])
            c = stage["gate"]["alpha"].shape[0]
            if a.shape not in ((c,), (1,)):
                raise ValueError(
                    f"DISK gate mismatch {a.shape} vs ({c},)")
            stage["gate"]["alpha"] = jnp.broadcast_to(
                jnp.asarray(a, jnp.float32), (c,))
            ai += 1
    if 0 < len(alphas) != n_gates:
        raise ValueError(
            f"DISK conversion: {len(alphas)} PReLU gains for "
            f"{n_gates} gates")
    return tree


def avg_pool(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def unet_apply(params, x):
    """x: (B, H, W, 3) → (B, H, W, 129)."""
    skips = []
    for i, stage in enumerate(params["down"]):
        if i > 0:
            skips.append(x)
            x = avg_pool(x)
        x = prelu(stage["gate"], instance_norm(conv2d(stage["conv"], x)))
    for i, stage in enumerate(params["up"]):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")
        x = jnp.concatenate([x, skips[-1 - i]], -1)
        x = conv2d(stage["conv"], x)
        if stage["gate"] is not None:
            x = prelu(stage["gate"], instance_norm(x))
    return x


@functools.partial(
    jax.jit,
    static_argnames=("max_keypoints", "nms_window", "detection_threshold"),
)
def apply(params, image, valid_wh, max_keypoints=2048, nms_window=5,
          detection_threshold=0.0):
    """image: (B, 3, H, W) in [0,1]; H, W divisible by 16.

    Returns the reference extractor contract: keypoints (B, N, 2),
    scores (B, N), descriptors (B, 128, N), mask (B, N).
    """
    x = image.transpose(0, 2, 3, 1)
    out = unet_apply(params, x)
    desc_map = out[..., :DESC_DIM]
    heat = out[..., DESC_DIM]
    h, w = heat.shape[1:3]
    radius = nms_window // 2

    def per_image(scores, dmap, vwh):
        scores = nms_ops.simple_nms(scores, radius)
        scores = scores * nms_ops.border_mask(
            h, w, 2, valid_wh=vwh, dtype=scores.dtype
        )
        kpts, kscores, mask = nms_ops.select_topk_keypoints(
            scores, max_keypoints, detection_threshold
        )
        ix = jnp.clip(kpts[:, 0].astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(kpts[:, 1].astype(jnp.int32), 0, h - 1)
        desc = dmap[iy, ix]  # (N, 128)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
        )
        return kpts, kscores, desc.T, mask

    kpts, kscores, desc, mask = jax.vmap(per_image)(
        heat, desc_map, valid_wh
    )
    return {"keypoints": kpts, "scores": kscores, "descriptors": desc,
            "mask": mask}


class DISK(BaseModel):
    """Reference contract: imcui/hloc/extractors/disk.py:8-37."""

    default_conf = {
        "weights": "depth",
        "max_keypoints": 2048,
        "nms_window_size": 5,
        "detection_threshold": 0.0,
        "pad_if_not_divisible": True,
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))
        b, _, h, w = image.shape
        # pad to /16 (the unet has 4 pools)
        hp = -(-h // 16) * 16
        wp = -(-w // 16) * 16
        if (hp, wp) != (h, w):
            image = jnp.pad(image, ((0, 0), (0, 0), (0, hp - h),
                                    (0, wp - w)))
        if "valid_wh" in data:
            valid_wh = jnp.asarray(data["valid_wh"], jnp.int32)
        else:
            valid_wh = jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))
        return apply(
            self.params, image, valid_wh,
            max_keypoints=self.conf["max_keypoints"],
            nms_window=self.conf["nms_window_size"],
            detection_threshold=float(self.conf["detection_threshold"]),
        )
