"""NetVLAD global descriptor, native JAX/XLA.

Re-implementation of the reference's own NetVLAD port (reference:
imcui/hloc/extractors/netvlad.py:17-146 — VGG16 conv5 trunk + NetVLAD
pooling layer + PCA whitening, MATLAB-trained weights). Used as the
retrieval backbone for SfM pair generation
(reference: imcui/ui/sfm.py:119-122).

TPU notes: the VLAD soft-assignment is one matmul over (HW, K) cluster
scores plus a masked sum — all MXU work; intra-normalisation and the final
L2 happen in f32.

Weight conversion: param paths mirror the reference's module naming
(backbone.{i} VGG conv indices, netvlad.score_proj/centers, whiten).
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import (assert_tree_matches, download_checkpoint,
                              load_state_dict)
from ..layers import conv2d, init_conv, init_linear, linear, max_pool, relu

# VGG16 conv layers up to conv5_3 (torchvision indices of the features
# Sequential that the reference slices — imcui/hloc/extractors/netvlad.py)
VGG16_CFG = [
    (64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
    (512, 512, 512),
]

N_CLUSTERS = 64
FEAT_DIM = 512
OUT_DIM = 4096


def init_params(rng):
    keys = jax.random.split(rng, 32)
    params = {"backbone": {}}
    idx = 0
    cin = 3
    ki = 0
    for bi, block in enumerate(VGG16_CFG):
        for cout in block:
            params["backbone"][str(idx)] = init_conv(
                keys[ki], 3, 3, cin, cout
            )
            ki += 1
            idx += 2  # conv + relu
            cin = cout
        idx += 1  # pool
    params["netvlad"] = {
        # reference NetVLADLayer: Conv1d(512, 64, 1, bias=False)
        "score_proj": init_conv(keys[ki], 1, 1, FEAT_DIM, N_CLUSTERS,
                                bias=False),
        "centers": jax.random.normal(keys[ki + 1],
                                     (FEAT_DIM, N_CLUSTERS)) * 0.01,
    }
    params["whiten"] = init_linear(
        keys[ki + 2], N_CLUSTERS * FEAT_DIM, OUT_DIM
    )
    return params


def load_params(conf):
    """A present-but-mismatched checkpoint raises (no silent random
    fallback); reference module names: backbone.N / netvlad.score_proj
    (Conv1d) / netvlad.centers / whiten."""
    init = init_params(jax.random.PRNGKey(0))
    name = conf.get("model_name", "VGG16-NetVLAD-Pitts30K")
    path = download_checkpoint(f"netvlad_{name}.mat.pth")
    if path is None:
        return init, {"pretrained": False}
    sd = load_state_dict(path)
    tree = _convert(sd, init)
    assert_tree_matches(tree, init, "netvlad")
    return tree, {"pretrained": True}


def _convert(sd, init):
    import numpy as np

    from ...utils.weights import vec

    tree = {"backbone": {}, "netvlad": {}, "whiten": {}}
    for k, arr in sd.items():
        parts = k.split(".")
        if parts[0] == "backbone" and parts[-1] in ("weight", "bias"):
            node = tree["backbone"].setdefault(parts[1], {})
            if arr.ndim == 4:
                node["w"] = vec(np.transpose(arr, (2, 3, 1, 0)))
            else:
                node["b"] = vec(arr)
        elif "score_proj" in k:
            node = tree["netvlad"].setdefault("score_proj", {})
            if arr.ndim == 4:
                node["w"] = vec(np.transpose(arr, (2, 3, 1, 0)))
            elif arr.ndim == 3:  # Conv1d (K, D, 1) → 1×1 conv (1,1,D,K)
                node["w"] = vec(np.transpose(arr[:, :, 0])[None, None])
            else:
                node["b"] = vec(arr)
        elif "centers" in k:
            tree["netvlad"]["centers"] = vec(arr)
        elif parts[0] == "whiten":
            tree["whiten"]["w" if parts[-1] == "weight" else "b"] = vec(
                np.transpose(arr) if arr.ndim == 2 else arr
            )
    return tree


def vgg16_trunk(params, x):
    """x: (B, H, W, 3) → (B, H/16, W/16, 512).

    Reference slices ``vgg16().features`` children ``[:-2]``
    (imcui/hloc/extractors/netvlad.py:65-68): the trunk ends at conv5_3
    WITHOUT its ReLU and without pool5 — pinned by
    tests/test_torch_parity3.py."""
    idx = 0
    for bi, block in enumerate(VGG16_CFG):
        for ci, _ in enumerate(block):
            x = conv2d(params[str(idx)], x)
            last = (bi == len(VGG16_CFG) - 1 and ci == len(block) - 1)
            if not last:
                x = relu(x)
            idx += 2
        idx += 1
        if bi < len(VGG16_CFG) - 1:
            x = max_pool(x)
    return x


def netvlad_pool(params, feats):
    """feats: (B, H, W, 512) → (B, 64·512) VLAD vector."""
    b = feats.shape[0]
    # L2-normalise input descriptors (reference does this first)
    feats = feats / jnp.maximum(
        jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-8
    )
    scores = conv2d(params["score_proj"], feats)  # (B, H, W, K)
    assign = jax.nn.softmax(scores, axis=-1)
    f = feats.reshape(b, -1, FEAT_DIM)  # (B, N, D)
    a = assign.reshape(b, -1, N_CLUSTERS)  # (B, N, K)
    # VLAD: sum_n a_nk (f_n - c_k)
    fa = jnp.einsum("bnd,bnk->bkd", f, a,
                    preferred_element_type=jnp.float32)
    centers = params["centers"].T  # (K, D)
    counts = a.sum(1)  # (B, K)
    vlad = fa - counts[..., None] * centers[None]
    # intra-normalisation per cluster, then flatten + L2
    vlad = vlad / jnp.maximum(
        jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-8
    )
    # flatten D-major (reference views (B, D, K) → d·K + k) so the
    # pretrained whitening layer sees the same ordering
    vlad = vlad.transpose(0, 2, 1).reshape(b, -1)
    return vlad / jnp.maximum(
        jnp.linalg.norm(vlad, axis=-1, keepdims=True), 1e-8
    )


@jax.jit
def apply(params, image):
    """image: (B, 3, H, W) in [0,1] → global_descriptor (B, 4096)."""
    x = image.transpose(0, 2, 3, 1)
    # the MATLAB weights expect raw [0,255] RGB minus the dataset mean;
    # approximated by the standard VGG means
    mean = jnp.asarray([123.68, 116.779, 103.939]) / 255.0
    x = (x - mean) * 255.0
    feats = vgg16_trunk(params["backbone"], x)
    vlad = netvlad_pool(params["netvlad"], feats)
    desc = linear(params["whiten"], vlad)
    return desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
    )


class NetVLAD(BaseModel):
    default_conf = {
        "model_name": "VGG16-NetVLAD-Pitts30K",
        "whiten": True,
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 1:  # grayscale → RGB
            image = jnp.tile(image, (1, 3, 1, 1))
        return {"global_descriptor": apply(self.params, image)}
