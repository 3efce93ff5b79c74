"""OmniGlue matcher (foundation-model-guided sparse matching), native JAX.

Reference contract: imcui/hloc/matchers/omniglue.py:18-70 — standalone
matcher {image0, image1} → matched keypoint pairs + confidences
(match_threshold 0.02, max_keypoints 2048); the reference runs SuperPoint
+ DINOv2 exports through ONNX. The published design: SuperPoint supplies
keypoints/descriptors; DINOv2 patch features at the keypoints provide
*generalisation guidance* — cross-attention between SuperPoint descriptors
is gated by DINO similarity, so appearance matching is steered by
foundation-level semantics while positions stay SuperPoint-sharp.

TPU-first: DINO guidance is a (N0, N1) similarity bias added to the
attention logits (one extra MXU matmul); the ViT runs as our native
backbones/vit.py encoder at a fixed patch grid; keypoints, gates, and the
mutual-softmax matching are fixed-shape masked ops.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops.attention import mha
from ...utils.base_model import BaseModel
from ...utils.weights import download_checkpoint
from ..backbones.vit import (encoder_block_apply, init_encoder_block,
                             init_patch_embed, patch_embed_apply,
                             sincos_pos_embed)
from ..extractors.superpoint import SuperPoint
from ..layers import init_linear, layer_norm, init_layer_norm, linear, relu

D_MODEL = 256
DINO_DIM = 384
PATCH = 14
N_VIT = 4
N_GNN = 4
NHEAD = 4


def init_params(rng):
    keys = jax.random.split(rng, 6 + N_VIT + 2 * N_GNN)
    params = {
        "patch_embed": init_patch_embed(keys[0], PATCH, 3, DINO_DIM),
        "vit": [init_encoder_block(keys[1 + i], DINO_DIM)
                for i in range(N_VIT)],
        "vit_ln": init_layer_norm(DINO_DIM),
        "kenc": {"0": init_linear(keys[1 + N_VIT], 3, 64),
                 "1": init_linear(keys[2 + N_VIT], 64, D_MODEL)},
        "gnn": [],
        "dino_gate": init_linear(keys[3 + N_VIT], 1, 1),
        "final": init_linear(keys[4 + N_VIT], D_MODEL, D_MODEL),
    }
    for i in range(N_GNN):
        k1, k2 = jax.random.split(keys[5 + N_VIT + i], 2)
        params["gnn"].append({
            "qkv": init_linear(k1, D_MODEL, 3 * D_MODEL),
            "mlp": {"0": init_linear(jax.random.fold_in(k2, 0),
                                     2 * D_MODEL, 2 * D_MODEL),
                    "2": init_linear(jax.random.fold_in(k2, 1),
                                     2 * D_MODEL, D_MODEL)},
        })
    return params


def load_params(conf):
    """Upstream OmniGlue ships its matcher as an ONNX graph
    (omniglue.onnx, reference imcui/hloc/matchers/omniglue.py:31).
    utils/onnx_reader.py extracts the TensorProto initializers without
    the onnx package (round-2's "onnx parser" blocker is cleared —
    tests/test_onnx_reader.py); they flow into the shared rank-based
    converter. The remaining documented gap is architectural: the GNN
    here is a TPU-first restatement (DINO similarity as an attention
    BIAS over fixed-k masked slots), so upstream tensor names map only
    where congruent — ``meta`` reports exactly which side loaded."""
    init = init_params(jax.random.PRNGKey(0))
    meta = {"pretrained": False}
    path = download_checkpoint("omniglue/omniglue.onnx")
    if path is not None:
        from ...utils.onnx_reader import onnx_to_state_dict
        from ...utils.weights import (assert_tree_matches,
                                      convert_state_dict_auto,
                                      prune_to_tree)

        sd = onnx_to_state_dict(path)
        meta["onnx_initializers"] = len(sd)
        tree = prune_to_tree(convert_state_dict_auto(sd), init)
        # loud on mismatch, like every .pth path (no silent fallback)
        assert_tree_matches(tree, init, "omniglue")
        init = tree
        meta["pretrained"] = True
    download_checkpoint("omniglue/dinov2_vitb14_pretrain.pth")
    if not meta["pretrained"]:
        meta["conversion_blocked_on"] = (
            "upstream-congruent GNN (onnx ingestion available)")
    return init, meta


def dino_features(params, image, kpts):
    """ViT patch features sampled at keypoints. image: (3, H, W) in [0,1];
    kpts: (N, 2) px → (N, DINO_DIM) L2-normalised."""
    c, h, w = image.shape
    hp = (h // PATCH) * PATCH
    wp = (w // PATCH) * PATCH
    img = image[:, :hp, :wp].transpose(1, 2, 0)  # (H, W, C)
    x, (gh, gw) = patch_embed_apply(params["patch_embed"], img, PATCH)
    x = x + sincos_pos_embed(gh, gw, DINO_DIM)
    for blk in params["vit"]:
        x = encoder_block_apply(blk, x, 6)  # (N_tokens, D)
    x = layer_norm(params["vit_ln"], x).reshape(gh, gw, DINO_DIM)
    ix = jnp.clip((kpts[:, 0] / PATCH).astype(jnp.int32), 0, gw - 1)
    iy = jnp.clip((kpts[:, 1] / PATCH).astype(jnp.int32), 0, gh - 1)
    f = x[iy, ix]
    return f / jnp.maximum(jnp.linalg.norm(f, -1, keepdims=True), 1e-8)


def gnn_layer(p, x, source, mask_src, bias=None):
    d = x.shape[-1]
    dh = d // NHEAD
    q = linear(p["qkv"], x)[:, :d].reshape(-1, NHEAD, dh).transpose(
        1, 0, 2)
    kv = linear(p["qkv"], source)
    k = kv[:, d:2 * d].reshape(-1, NHEAD, dh).transpose(1, 0, 2)
    v = kv[:, 2 * d:].reshape(-1, NHEAD, dh).transpose(1, 0, 2)
    msg = mha(q, k, v, mask_k=mask_src, bias=bias)
    msg = msg.transpose(1, 0, 2).reshape(-1, d)
    return x + linear(p["mlp"]["2"], relu(linear(
        p["mlp"]["0"], jnp.concatenate([x, msg], -1))))


def forward(params, kpts0, kpts1, scores0, scores1, desc0, desc1,
            dino0, dino1, mask0, mask1, size0, size1, threshold):
    p0n = (kpts0 - size0 / 2) / size0.max()
    p1n = (kpts1 - size1 / 2) / size1.max()

    def enc(pn, s, d):
        k = linear(params["kenc"]["1"], relu(linear(
            params["kenc"]["0"],
            jnp.concatenate([pn, s[:, None]], -1))))
        return k + d

    f0 = enc(p0n, scores0, desc0)
    f1 = enc(p1n, scores1, desc1)
    # DINO guidance: foundation similarity as a cross-attention bias
    gscale = jax.nn.softplus(params["dino_gate"]["w"][0, 0]) + 1.0
    dino_sim = (dino0 @ dino1.T) * gscale
    for i, p in enumerate(params["gnn"]):
        if i % 2 == 0:
            f0 = gnn_layer(p, f0, f0, mask0)
            f1 = gnn_layer(p, f1, f1, mask1)
        else:
            f0n = gnn_layer(p, f0, f1, mask1, bias=dino_sim[None])
            f1 = gnn_layer(p, f1, f0, mask0, bias=dino_sim.T[None])
            f0 = f0n
    f0 = linear(params["final"], f0)
    f1 = linear(params["final"], f1)

    sim = (f0 @ f1.T) / D_MODEL ** 0.5
    sim = jnp.where(mask0[:, None] & mask1[None, :], sim, -1e9)
    conf = jax.nn.softmax(sim, 1) * jax.nn.softmax(sim, 0)
    nn01 = jnp.argmax(conf, 1)
    nn10 = jnp.argmax(conf, 0)
    mutual = jnp.arange(conf.shape[0]) == jnp.take(nn10, nn01)
    score = jnp.max(conf, 1)
    ok = mutual & (score > threshold) & mask0
    k1m = jnp.take(kpts1, nn01, axis=0)
    return (jnp.where(ok[:, None], kpts0, 0.0),
            jnp.where(ok[:, None], k1m, 0.0),
            jnp.where(ok, score, 0.0), ok)


@functools.partial(jax.jit, static_argnames=("threshold",))
def _apply_batched(params, kpts0, kpts1, s0, s1, d0, d1, g0, g1, m0, m1,
                   size0, size1, threshold):
    k0, k1, sc, ok = jax.vmap(
        lambda *a: forward(params, *a, threshold)
    )(kpts0, kpts1, s0, s1, d0, d1, g0, g1, m0, m1, size0, size1)
    return {"keypoints0": k0, "keypoints1": k1, "scores": sc,
            "mconf": sc, "mask": ok}


class OmniGlue(BaseModel):
    """Reference contract: imcui/hloc/matchers/omniglue.py:18."""

    default_conf = {
        "match_threshold": 0.02,
        "max_keypoints": 2048,
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        self.sp = SuperPoint({
            "max_keypoints": conf["max_keypoints"],
            "keypoint_threshold": 0.005,
        })
        self._threshold = float(conf["match_threshold"])

    def _forward(self, data):
        import numpy as np

        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)

        def gray(img):
            return img.mean(1, keepdims=True) if img.shape[1] == 3 else img

        def rgb(img):
            return jnp.tile(img, (1, 3, 1, 1)) if img.shape[1] == 1 \
                else img

        f0 = self.sp({"image": np.asarray(gray(image0))})
        f1 = self.sp({"image": np.asarray(gray(image1))})
        k0 = jnp.asarray(f0["keypoints"], jnp.float32)
        k1 = jnp.asarray(f1["keypoints"], jnp.float32)
        g0 = jax.vmap(lambda im, kp: dino_features(self.params, im, kp))(
            rgb(image0), k0)
        g1 = jax.vmap(lambda im, kp: dino_features(self.params, im, kp))(
            rgb(image1), k1)
        b = k0.shape[0]
        h0, w0 = image0.shape[-2:]
        h1, w1 = image1.shape[-2:]
        return _apply_batched(
            self.params, k0, k1,
            jnp.asarray(f0["scores"], jnp.float32),
            jnp.asarray(f1["scores"], jnp.float32),
            jnp.asarray(f0["descriptors"], jnp.float32).transpose(0, 2, 1),
            jnp.asarray(f1["descriptors"], jnp.float32).transpose(0, 2, 1),
            g0, g1,
            jnp.asarray(f0["mask"], bool), jnp.asarray(f1["mask"], bool),
            jnp.tile(jnp.asarray([[w0, h0]], jnp.float32), (b, 1)),
            jnp.tile(jnp.asarray([[w1, h1]], jnp.float32), (b, 1)),
            self._threshold)
