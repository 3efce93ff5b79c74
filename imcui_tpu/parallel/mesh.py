"""Device-mesh sharding for pair-batched serving — the reference's only
scale-out is HTTP-level process replication (4 Ray-Serve replicas × 1 GPU,
reference: imcui/config/api.yaml:2-5, api/server.py:42-64; census in
SURVEY §2.9). The TPU-native replacement:

- **data parallelism (dp)** over the pair batch: one jitted program, batch
  axis sharded over the ``data`` mesh axis; XLA needs no collectives, ICI
  stays idle, scaling is linear — this is replica-serving without replicas.
- **tensor parallelism (tp)** over the matcher's hidden dimension: the big
  LightGlue linears (Wqkv, ffn) shard over the ``model`` axis; XLA inserts
  all-reduces over ICI automatically from the shardings. Useful when a
  single pair must go faster than one chip allows (latency-bound serving).

Everything uses `jax.sharding.NamedSharding` + jit — no hand-written
collectives needed at this layer (Pallas ring kernels live in ops/ for the
cases XLA can't schedule well).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, model_parallel=1, devices=None):
    """(data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def replicate(tree, mesh):
    """Place a pytree fully replicated on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree, mesh):
    """Shard the leading (batch) axis of every leaf over the data axis."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


# ---------------------------------------------------------------------------
# tensor-parallel sharding rules for the LightGlue param tree
# ---------------------------------------------------------------------------

def _lightglue_spec(path, leaf):
    """PartitionSpec for a LightGlue param leaf, addressed by tree path."""
    names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    if "Wqkv" in names or "to_qk" in names or "to_v" in names:
        # column-parallel: shard the output features
        return P(None, "model") if leaf.ndim == 2 else P("model")
    if "out_proj" in names or "to_out" in names:
        # row-parallel: shard the input features; output all-reduced
        return P("model", None) if leaf.ndim == 2 else P()
    if "ffn" in names and "0" in names:
        return P(None, "model") if leaf.ndim == 2 else P("model")
    if "ffn" in names and "3" in names:
        return P("model", None) if leaf.ndim == 2 else P()
    return P()


def shard_lightglue_params(params, mesh):
    """Apply megatron-style column/row parallel shardings to the LightGlue
    linears over the ``model`` axis. With jit, XLA derives the matching
    all-reduces automatically."""

    def put(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, _lightglue_spec(path, leaf))
        )

    return jax.tree_util.tree_map_with_path(put, params)


def shard_flagship_params(params, mesh):
    """Shard the two-view flagship params: SuperPoint replicated (conv
    trunk is small), LightGlue tensor-parallel when the model axis > 1."""
    out = dict(params)
    out["superpoint"] = replicate(params["superpoint"], mesh)
    if mesh.shape["model"] > 1:
        out["lightglue"] = shard_lightglue_params(params["lightglue"], mesh)
    else:
        out["lightglue"] = replicate(params["lightglue"], mesh)
    return out


# ---------------------------------------------------------------------------
# tensor-parallel sharding rules for the ViT-L-class trees
# (DUSt3R/MASt3R encoder+decoder — models/backbones/vit.py — and DINOv2
# — models/backbones/dinov2.py). Megatron layout: fused qkv / q,k,v /
# mlp-fc1 column-parallel, attention-out / mlp-fc2 row-parallel; XLA's
# SPMD partitioner derives the all-reduces over ICI from the shardings.
# ---------------------------------------------------------------------------

_COL = ("qkv", "projq", "projk", "projv", "fc1")
_ROW_OUT = ("fc2",)


def _vit_spec(path, leaf):
    from jax.sharding import PartitionSpec as P

    names = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
    if leaf.ndim not in (1, 2):
        return P()  # convs (patch embed, dpt head), pos embeds
    in_attn = any(n in ("attn", "cross_attn") for n in names)
    is_w = names and names[-1] == "w"
    is_b = names and names[-1] == "b"
    if any(n in _COL for n in names):
        if is_w:
            return P(None, "model")
        if is_b:
            return P("model")
        return P()
    row = any(n in _ROW_OUT for n in names) or ("proj" in names and in_attn)
    if row:
        if is_w:
            return P("model", None)
        return P()  # row-parallel bias added once post-all-reduce
    return P()


def shard_vit_params(params, mesh):
    """Tensor-parallel placement for a ViT param tree (DUSt3R's
    encoder/decoder or DINOv2 blocks) over the ``model`` axis."""

    def put(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, _vit_spec(path,
                                                                  leaf)))

    return jax.tree_util.tree_map_with_path(put, params)


def shard_duster_params(params, mesh):
    """DUSt3R: transformer stacks tensor-parallel, heads replicated."""
    if mesh.shape["model"] == 1:
        return replicate(params, mesh)
    out = {}
    for k, v in params.items():
        if k in ("enc_blocks", "dec_blocks", "dec_blocks2"):
            out[k] = shard_vit_params(v, mesh)
        else:
            out[k] = replicate(v, mesh)
    return out


def shard_roma_params(params, mesh):
    """RoMa (DINOv2+GP architecture): the DINOv2 encoder blocks and the
    embedding-decoder ViT blocks go tensor-parallel over ``model`` (they
    carry ~80% of the parameters and the token-mixing matmuls); the GP,
    VGG pyramid and conv refiners replicate — they are conv- and
    gather-dominated, and GSPMD keeps the dp axis over pairs. Layouts
    are placement hints: XLA inserts the collectives, so any mesh shape
    stays exact (pinned by tests/test_parallel.py)."""
    if mesh.shape["model"] == 1:
        return replicate(params, mesh)
    out = {}
    for k, v in params.items():
        if k in ("dinov2", "embedding_decoder"):
            out[k] = {kk: (shard_vit_params(vv, mesh) if kk == "blocks"
                           else replicate(vv, mesh))
                      for kk, vv in v.items()}
        else:
            out[k] = replicate(v, mesh)
    return out


def pad_batch_to(tree, batch):
    """Pad every leaf's leading axis up to ``batch`` (serving: fill the
    last partial pair-batch so the compiled shape is reused)."""
    def pad(x):
        b = x.shape[0]
        if b == batch:
            return x
        reps = [(0, batch - b)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, reps)

    return jax.tree_util.tree_map(pad, tree), (
        tree[next(iter(tree))].shape[0] if isinstance(tree, dict) else None
    )
