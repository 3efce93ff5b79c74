"""SuperGlue attentional GNN matcher, native JAX/XLA.

Re-implementation of the architecture behind the reference wrapper
(reference: imcui/hloc/matchers/superglue.py:13-43; the network lives in the
SuperGluePretrainedNetwork submodule — rebuilt here from the published
architecture: keypoint-MLP encoder, 9×(self+cross) attentional GNN,
log-domain Sinkhorn assignment with learnable dustbin).

TPU-first: all 1×1 Conv1d become (N, C) matmuls on the MXU; the Sinkhorn
iterations are a ``lax.scan`` with masked marginals (ops/sinkhorn.py), so
padded keypoint slots carry zero transport mass; the full forward is one
jit and pair-batches run through a single vmap.

Weight conversion: torch state_dict paths (kenc.encoder.{i}, gnn.layers
.{i}.attn.merge/proj.{j}, gnn.layers.{i}.mlp.{j}, final_proj, bin_score)
map 1:1 onto the param tree; Conv1d kernels are squeezed to linears.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops.attention import mha
from ...ops.sinkhorn import log_optimal_transport, matches_from_assignment
from ...utils.base_model import BaseModel
from ...utils.weights import (assert_tree_matches, download_checkpoint,
                              load_state_dict, vec)
from ..layers import batch_norm_inference, init_linear, linear, relu

KENC_CHANNELS = [3, 32, 64, 128, 256]


def init_bn(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def init_mlp(key, channels):
    """MLP of 1×1 convs with BN+ReLU between (SuperGlue MLP()). Param keys
    mirror the torch Sequential indices (conv at 3i, bn at 3i+1)."""
    p = {}
    keys = jax.random.split(key, len(channels))
    idx = 0
    for i in range(1, len(channels)):
        p[str(idx)] = init_linear(keys[i - 1], channels[i - 1], channels[i])
        idx += 1
        if i < len(channels) - 1:
            p[str(idx)] = init_bn(channels[i])
            idx += 2  # BN, ReLU (ReLU has no params)
    return p


def mlp_apply(p, x, channels):
    idx = 0
    for i in range(1, len(channels)):
        x = linear(p[str(idx)], x)
        idx += 1
        if i < len(channels) - 1:
            x = relu(batch_norm_inference(p[str(idx)], x))
            idx += 2
    return x


def init_params(rng, conf):
    dim = conf["descriptor_dim"]
    n_layers = conf["gnn_layers"]
    keys = jax.random.split(rng, 3 + n_layers)
    params = {
        "kenc": {"encoder": init_mlp(keys[0], KENC_CHANNELS + [dim])},
        "gnn": {"layers": []},
        "final_proj": init_linear(keys[1], dim, dim),
        "bin_score": jnp.asarray(1.0, jnp.float32),
    }
    for i in range(n_layers):
        k = jax.random.split(keys[3 + i], 5)
        params["gnn"]["layers"].append(
            {
                "attn": {
                    "merge": init_linear(k[0], dim, dim),
                    "proj": {
                        "0": init_linear(k[1], dim, dim),
                        "1": init_linear(k[2], dim, dim),
                        "2": init_linear(k[3], dim, dim),
                    },
                },
                "mlp": init_mlp(k[4], [2 * dim, 2 * dim, dim]),
            }
        )
    return params


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0), conf)
    name = f"superglue_{conf['weights']}.pth"
    path = download_checkpoint(name)
    if path is None:
        return init, {"pretrained": False}
    sd = load_state_dict(path)
    # classify tensors by rank; BN layers are identified by a sibling
    # running_mean in the same module
    import numpy as np

    tree = {}
    norm_map = {"weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var"}
    for k, arr in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        parts = k.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf = parts[-1]
        if k == "bin_score":
            tree["bin_score"] = vec(np.asarray(arr).reshape(()))
        elif arr.ndim == 3:  # conv1d
            node["w" if leaf == "weight" else "b"] = vec(
                np.transpose(arr[..., 0]))
        elif arr.ndim == 2:
            node["w" if leaf == "weight" else "b"] = vec(np.transpose(arr))
        else:
            prefix = ".".join(parts[:-1])
            is_bn = f"{prefix}.running_mean" in sd
            if is_bn:
                node[norm_map[leaf]] = vec(arr)
            else:
                node["b" if leaf == "bias" else "w"] = vec(arr)
    n_layers = conf["gnn_layers"]
    tree["gnn"]["layers"] = [tree["gnn"]["layers"][str(i)]
                             for i in range(n_layers)]
    assert_tree_matches(tree, init, "superglue")
    return tree, {"pretrained": True}


def normalize_keypoints(kpts, size_wh):
    """SuperGlue convention: center, scale by 0.7·max-dim."""
    size = size_wh.astype(jnp.float32)
    center = size / 2.0
    scaling = jnp.max(size, axis=-1, keepdims=True) * 0.7
    return (kpts - center[None, :]) / scaling[None, :]


def _heads(x, num_heads):
    n, d = x.shape
    return x.reshape(n, num_heads, d // num_heads).transpose(1, 0, 2)


def _merge_heads(x):
    h, n, dh = x.shape
    return x.transpose(1, 0, 2).reshape(n, h * dh)


def attn_propagation(p, x, source, mask_src, num_heads):
    q = _heads(linear(p["attn"]["proj"]["0"], x), num_heads)
    k = _heads(linear(p["attn"]["proj"]["1"], source), num_heads)
    v = _heads(linear(p["attn"]["proj"]["2"], source), num_heads)
    message = linear(p["attn"]["merge"], _merge_heads(mha(q, k, v, mask_src)))
    return mlp_apply(p["mlp"], jnp.concatenate([x, message], -1),
                     [512, 512, 256])


def forward_pair(params, kpts0, kpts1, scores0, scores1, desc0, desc1,
                 mask0, mask1, size0, size1, conf):
    num_heads = conf["num_heads"]
    # keypoint encoder: desc + MLP([x, y, score])
    k0 = normalize_keypoints(kpts0, size0)
    k1 = normalize_keypoints(kpts1, size1)
    inp0 = jnp.concatenate([k0, scores0[:, None]], -1)
    inp1 = jnp.concatenate([k1, scores1[:, None]], -1)
    x0 = desc0 + mlp_apply(params["kenc"]["encoder"], inp0,
                           KENC_CHANNELS + [256])
    x1 = desc1 + mlp_apply(params["kenc"]["encoder"], inp1,
                           KENC_CHANNELS + [256])

    for i, layer in enumerate(params["gnn"]["layers"]):
        if i % 2 == 0:  # self
            d0 = attn_propagation(layer, x0, x0, mask0, num_heads)
            d1 = attn_propagation(layer, x1, x1, mask1, num_heads)
        else:  # cross
            d0 = attn_propagation(layer, x0, x1, mask1, num_heads)
            d1 = attn_propagation(layer, x1, x0, mask0, num_heads)
        x0 = x0 + d0
        x1 = x1 + d1

    m0 = linear(params["final_proj"], x0)
    m1 = linear(params["final_proj"], x1)
    dim = m0.shape[-1]
    sim = jnp.einsum("nd,md->nm", m0, m1,
                     preferred_element_type=jnp.float32) / dim**0.5
    Z = log_optimal_transport(
        sim, params["bin_score"], conf["sinkhorn_iterations"],
        mask0=mask0, mask1=mask1,
    )
    matches0, mscores0 = matches_from_assignment(
        Z, conf["match_threshold"], mask0=mask0, mask1=mask1
    )
    return {"matches0": matches0, "matching_scores0": mscores0}


@functools.partial(jax.jit, static_argnames=("conf_key",))
def _apply_batched(params, kpts0, kpts1, scores0, scores1, desc0, desc1,
                   mask0, mask1, size0, size1, conf_key):
    conf = dict(conf_key)
    return jax.vmap(
        lambda *args: forward_pair(params, *args, conf=conf)
    )(kpts0, kpts1, scores0, scores1, desc0, desc1, mask0, mask1,
      size0, size1)


class SuperGlue(BaseModel):
    """BaseModel wrapper (reference contract:
    imcui/hloc/matchers/superglue.py:13-43 + configs/matchers.py:8-33)."""

    default_conf = {
        "weights": "outdoor",
        "descriptor_dim": 256,
        "num_heads": 4,
        "gnn_layers": 18,  # 9 × (self + cross)
        "sinkhorn_iterations": 50,
        "match_threshold": 0.2,
    }
    required_inputs = [
        "keypoints0", "keypoints1", "descriptors0", "descriptors1",
        "scores0", "scores1",
    ]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)
        self._conf_key = tuple(
            sorted(
                {
                    "num_heads": conf["num_heads"],
                    "sinkhorn_iterations": int(conf["sinkhorn_iterations"]),
                    "match_threshold": float(conf["match_threshold"]),
                }.items()
            )
        )

    def _forward(self, data):
        kpts0 = jnp.asarray(data["keypoints0"], jnp.float32)
        kpts1 = jnp.asarray(data["keypoints1"], jnp.float32)
        desc0 = jnp.asarray(data["descriptors0"], jnp.float32)
        desc1 = jnp.asarray(data["descriptors1"], jnp.float32)
        if desc0.shape[1] != kpts0.shape[1]:
            desc0 = desc0.transpose(0, 2, 1)
        if desc1.shape[1] != kpts1.shape[1]:
            desc1 = desc1.transpose(0, 2, 1)
        scores0 = jnp.asarray(data["scores0"], jnp.float32)
        scores1 = jnp.asarray(data["scores1"], jnp.float32)
        b, n0 = kpts0.shape[:2]
        n1 = kpts1.shape[1]
        mask0 = jnp.asarray(data.get("mask0", jnp.ones((b, n0), bool)), bool)
        mask1 = jnp.asarray(data.get("mask1", jnp.ones((b, n1), bool)), bool)

        def sizes(key_img, key_wh, kpts):
            if key_wh in data:
                return jnp.asarray(data[key_wh], jnp.float32)
            img = data.get(key_img)
            if img is not None and hasattr(img, "shape") and len(img.shape) == 4:
                h, w = img.shape[-2:]
                return jnp.tile(jnp.asarray([[w, h]], jnp.float32), (b, 1))
            return jnp.max(kpts, axis=1) + 1.0

        size0 = sizes("image0", "size0", kpts0)
        size1 = sizes("image1", "size1", kpts1)
        return _apply_batched(
            self.params, kpts0, kpts1, scores0, scores1, desc0, desc1,
            mask0, mask1, size0, size1, self._conf_key,
        )
