"""SuperPoint keypoint detector + descriptor, native JAX/XLA.

Re-implementation of the architecture wrapped by the reference
(reference wrapper: imcui/hloc/extractors/superpoint.py:33-57; the network
itself lives in the SuperGluePretrainedNetwork submodule — empty in the
snapshot, so this is built from the published architecture: VGG-style
shared encoder, 65-channel cell softmax detector head with depth-to-space,
256-d descriptor head with bilinear sampling at keypoints).

TPU-first differences from the torch original:
- NHWC activations; convs compiled straight onto the MXU in one fused
  XLA program (trunk + both heads).
- Fixed-k output: ``max_keypoints`` slots with a validity mask instead of
  dynamic keypoint counts (``keypoint_threshold`` becomes the mask rule).
- The whole forward — trunk, softmax-NMS, top-k, descriptor sampling —
  is a single jit; nothing leaves the device.

Weight conversion: torch state_dict keys conv{1a..4b,Pa,Pb,Da,Db} map 1:1
onto the param tree (utils/weights.py).
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import (assert_tree_matches, download_checkpoint,
                              load_state_dict, state_dict_to_tree)
from ...ops import pallas_nms
from .. import layers
from ..layers import conv2d, init_conv, max_pool, relu

CONV_SPECS = [
    # name, cin, cout, kernel
    ("conv1a", 1, 64, 3), ("conv1b", 64, 64, 3),
    ("conv2a", 64, 64, 3), ("conv2b", 64, 64, 3),
    ("conv3a", 64, 128, 3), ("conv3b", 128, 128, 3),
    ("conv4a", 128, 128, 3), ("conv4b", 128, 128, 3),
    ("convPa", 128, 256, 3), ("convPb", 256, 65, 1),
    ("convDa", 128, 256, 3), ("convDb", 256, 256, 1),
]


def init_params(rng):
    params = {}
    keys = jax.random.split(rng, len(CONV_SPECS))
    for key, (name, cin, cout, k) in zip(keys, CONV_SPECS):
        params[name] = init_conv(key, k, k, cin, cout)
    return params


def load_params(conf):
    """Try pretrained weights (HF hub), else deterministic random init.

    conf["checkpoint_npz"] short-circuits to a locally trained tree
    (tools/train_superpoint.py output via utils.weights.save_tree_npz)."""
    init = init_params(jax.random.PRNGKey(0))
    npz = conf.get("checkpoint_npz") if isinstance(conf, dict) else None
    if npz:
        from ...utils.weights import load_tree_npz
        return load_tree_npz(npz, init, "superpoint"), {
            "pretrained": True, "source": str(npz)}
    path = download_checkpoint("superpoint_v1.pth")
    if path is None:
        # offline fallback: the committed locally trained detector
        # (weights/superpoint_adapted.npz — full published recipe on the
        # real chip; weights/README.md) beats random init everywhere
        from ...utils.weights import load_tree_npz, local_trained_npz

        local = local_trained_npz("superpoint_adapted.npz")
        if local is not None:
            return load_tree_npz(local, init, "superpoint"), {
                "pretrained": True, "source": f"local:{local}"}
        return init, {"pretrained": False}
    sd = load_state_dict(path)
    params = state_dict_to_tree(sd, [(r"conv", "conv")])
    assert_tree_matches(params, init, "superpoint")
    return params, {"pretrained": True}


def backbone(params, x):
    """Shared VGG encoder. x: (B, H, W, 1) → (B, H/8, W/8, 128).

    Stages 1–2 (the C=64 layers, ~75% of trunk time at 1024²) run
    width-folded: horizontal pixel pairs are packed into channels so the
    convs hit the MXU's full 128-lane width (see layers.fold_conv3x3;
    exact-equivalent, measured 26.8 → ~16 ms for the trunk at 8×1024²).
    Falls back to the plain layout when W isn't divisible by 16 / H by 4
    (preprocessing pads to dfactor=8, so the fast path is the norm)."""
    from ...ops import pallas_stage1

    b, h, w, _ = x.shape
    if h % 4 == 0 and w % 16 == 0:
        # the fused Pallas tail is bf16-internal; keep the f32 path on
        # pure XLA so `precision="fp32"` stays exact
        use_pallas = x.dtype == jnp.bfloat16

        def stage(y, pa, pb, hh, ww2):
            """conv_a → relu → conv_b → relu → pool, folded; fused Pallas
            tail when shapes/backend allow, folded XLA otherwise.
            (Computing conv1a INSIDE the kernel was tried and rejected:
            pallas_stage1.stem_tail — trunk 21.4 → 30.7 ms at 8×1024².)"""
            fa = layers.fold_conv3x3(pa)
            fb = layers.fold_conv3x3(pb)
            if use_pallas and pallas_stage1.supported(hh, ww2):
                y_raw = conv2d({"w": fa["w"]}, y)     # no bias/relu: fused
                return pallas_stage1.stage_tail(
                    y_raw.astype(jnp.bfloat16), fa["b"], fb["w"], fb["b"])
            y = relu(conv2d(fa, y))
            y = relu(conv2d(fb, y))
            return layers.max_pool_folded(y)

        y = layers.fold_width(x)                              # (B,H,W/2,2)
        y = stage(y, params["conv1a"], params["conv1b"], h, w // 2)
        y = stage(y, params["conv2a"], params["conv2b"], h // 2, w // 4)
        # y is folded (B,H/4,W/8,128): conv3a consumes the folded layout
        # directly (its folded kernel is (3,3,128,256)), then unfolding
        # the 256-lane output is a free reshape
        x = layers.unfold_width(
            relu(conv2d(layers.fold_conv3x3(params["conv3a"]), y)))
    else:
        x = relu(conv2d(params["conv1a"], x))
        x = relu(conv2d(params["conv1b"], x))
        x = max_pool(x)
        x = relu(conv2d(params["conv2a"], x))
        x = relu(conv2d(params["conv2b"], x))
        x = max_pool(x)
        x = relu(conv2d(params["conv3a"], x))
    x = relu(conv2d(params["conv3b"], x))
    x = max_pool(x)
    x = relu(conv2d(params["conv4a"], x))
    x = relu(conv2d(params["conv4b"], x))
    return x


def dense_scores(params, feats):
    """Detector head → full-resolution heatmap (B, H, W), f32."""
    cpa = relu(conv2d(params["convPa"], feats))
    logits = conv2d(params["convPb"], cpa).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)[..., :-1]  # drop dustbin
    # (B, Hc, Wc, 64) → (B, H, W)
    def d2s(p):  # (Hc, Wc, 64)
        return nms_ops.depth_to_space(p.transpose(2, 0, 1), 8)[0]

    return jax.vmap(d2s)(probs)


def dense_descriptors(params, feats):
    """Descriptor head → (B, Hc, Wc, 256) f32, L2-normalised per cell.

    The norm is sqrt(max(‖d‖², ε)) rather than max(‖d‖, ε): identical
    for any real descriptor, but the gradient of ‖d‖ at d = 0 is 0/0 and
    clamping AFTER the sqrt does not block it. Exactly-zero cells occur
    in training (warped-out borders are exact zeros, conv biases start
    at zero, so the whole column stays zero); with the clamp inside, the
    backward picks the constant branch and the gradient is cleanly 0
    (found as all-leaf NaN grads in the homographic-adaptation run)."""
    cda = relu(conv2d(params["convDa"], feats))
    desc = conv2d(params["convDb"], cda).astype(jnp.float32)
    sq = (desc * desc).sum(-1, keepdims=True)
    return desc / jnp.sqrt(jnp.maximum(sq, 1e-16))


def _refine_subpixel(kpts, heat, mask):
    """Batched radius-1 soft-argmax refinement on the RAW heatmap;
    masked slots stay pinned at their sentinel coords."""
    heatf = heat.astype(jnp.float32)
    ref = jax.vmap(lambda kp, hm: nms_ops.soft_argmax_refinement(
        kp, hm, radius=1))(kpts, heatf)
    return jnp.where(mask[..., None], ref, kpts)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nms_radius", "max_keypoints", "keypoint_threshold",
        "remove_borders", "precision", "subpixel",
    ),
)
def apply(
    params,
    image,
    valid_wh,
    nms_radius=4,
    max_keypoints=1024,
    keypoint_threshold=0.005,
    remove_borders=4,
    precision="bf16",
    subpixel=False,
):
    """Full SuperPoint forward.

    ``subpixel``: refine keypoints by a soft-argmax over the RAW
    heatmap around each selected peak (ops/nms.soft_argmax_refinement;
    radius 1). OFF by default for upstream parity — the published
    SuperPoint emits integer pixel peaks — but the cell-grid decode
    quantises localisation, which dominates relative-pose error for the
    locally trained detector (r5: synthetic-pose median err 12.9° vs
    SIFT's 0.7° at the same pair set; BASELINE.md "Pose AUC").

    image: (B, 1, H, W) float32 in [0,1] (reference layout, zero-padded to
    the bucket); valid_wh: (B, 2) int valid region per image.
    Returns keypoints (B, N, 2) xy, scores (B, N), descriptors (B, 256, N),
    mask (B, N) — the reference output contract (SURVEY §2.6) + mask.

    precision: "bf16" runs the conv trunk + heads in bfloat16 (native MXU
    rate, ~2-4×); score softmax and descriptor normalisation stay f32.
    Use "fp32" for golden-parity runs.
    """
    x = image.transpose(0, 2, 3, 1)  # NCHW → NHWC
    cparams = params
    if precision == "bf16":
        cparams = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params
        )
        x = x.astype(jnp.bfloat16)
    feats = backbone(cparams, x)
    heat = dense_scores(cparams, feats)  # (B, H, W) f32
    if precision == "bf16":
        # NMS + top-k run comparisons only; bf16 halves the ~10
        # full-resolution reduce_window passes' HBM traffic. Scores are
        # softmax probabilities in [0,1], representable to 2^-8 relative
        # — selection order changes only between near-ties.
        heat = heat.astype(jnp.bfloat16)
    # pin the heatmap: without this barrier XLA rematerialises the
    # depth-to-space relayout into every NMS reduce_window consumer
    # (measured +10.3 ms vs +3.4 ms at 8×1024²)
    heat = jax.lax.optimization_barrier(heat)
    desc_map = dense_descriptors(cparams, feats)  # (B, Hc, Wc, 256) f32

    h, w = heat.shape[-2:]

    if precision == "bf16" and pallas_nms.supported(h, w, nms_radius):
        # fused single-pass NMS + 4×4 cell reduction (ops/pallas_nms.py):
        # replaces ~10 full-res reduce_window passes + a 1M-element
        # approx_max_k with one heatmap read and a 16×-smaller top-k
        kpts, kscores, mask = pallas_nms.select_keypoints(
            heat, valid_wh, max_keypoints, keypoint_threshold,
            radius=nms_radius, border=remove_borders)
        if subpixel:
            kpts = _refine_subpixel(kpts, heat, mask)
        desc = jax.vmap(
            lambda kp, dm: nms_ops.sample_descriptors(
                kp, dm.transpose(2, 0, 1), s=8))(kpts, desc_map)
    else:
        def per_image(scores, dmap, vwh):
            raw = scores  # pre-NMS heatmap for subpixel refinement
            scores = nms_ops.simple_nms(scores, nms_radius)
            scores = scores * nms_ops.border_mask(
                h, w, remove_borders, valid_wh=vwh, dtype=scores.dtype
            )
            kpts, kscores, mask = nms_ops.select_topk_keypoints(
                scores, max_keypoints, keypoint_threshold
            )
            if subpixel:
                kpts = _refine_subpixel(kpts[None], raw[None],
                                        mask[None])[0]
            desc = nms_ops.sample_descriptors(
                kpts, dmap.transpose(2, 0, 1), s=8
            )  # (256, N)
            return kpts, kscores, desc, mask

        kpts, kscores, desc, mask = jax.vmap(per_image)(heat, desc_map,
                                                        valid_wh)
    return {
        "keypoints": kpts,
        "scores": kscores.astype(jnp.float32),
        "descriptors": desc,
        "mask": mask,
    }


class SuperPoint(BaseModel):
    """BaseModel wrapper (reference contract:
    imcui/hloc/extractors/superpoint.py:33-57)."""

    default_conf = {
        "nms_radius": 4,
        "keypoint_threshold": 0.005,
        "max_keypoints": 1024,
        "remove_borders": 4,
        "fix_sampling": False,  # our sampling is always the fixed variant
        "precision": "bf16",  # TPU-native trunk dtype; "fp32" for parity
        "subpixel": False,  # soft-argmax peak refinement (see apply())
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        # reference uses -1 for "keep all"; fixed shapes need a cap
        if conf["max_keypoints"] in (-1, None):
            conf["max_keypoints"] = 4096

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        b = image.shape[0]
        if "valid_wh" in data:
            valid_wh = jnp.asarray(data["valid_wh"], jnp.int32)
        else:
            valid_wh = jnp.tile(
                jnp.asarray([[image.shape[3], image.shape[2]]], jnp.int32),
                (b, 1),
            )
        return apply(
            self.params,
            image,
            valid_wh,
            nms_radius=self.conf["nms_radius"],
            max_keypoints=self.conf["max_keypoints"],
            keypoint_threshold=self.conf["keypoint_threshold"],
            remove_borders=self.conf["remove_borders"],
            precision=self.conf["precision"],
            subpixel=self.conf.get("subpixel", False),
        )
