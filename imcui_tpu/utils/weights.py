"""Pretrained-weight acquisition + torch→JAX conversion.

The reference pulls pretrained torch checkpoints from the HF hub repo
``Realcat/imcui_checkpoints`` (reference: imcui/hloc/utils/base_model.py:37-43,
imcui/hloc/__init__.py:65-66). We keep that source but convert each
``state_dict`` into the nested JAX param pytrees our functional models use.

Offline environments (no egress) fall back to deterministic random init so
every pipeline stays runnable end-to-end; ``params_meta`` records which path
was taken so benchmarks can annotate accuracy validity.
"""

import re
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .. import MODEL_REPO_ID, logger

_CACHE_DIR = Path.home() / ".cache" / "imcui_tpu"
_OFFLINE = False  # set after the first failed network fetch


def download_checkpoint(filename, repo_id=MODEL_REPO_ID):
    """Try to fetch a checkpoint from the HF hub; None if offline/missing.

    After the first network failure the process remembers it is offline so
    later models fail fast instead of re-running the hub's retry loop.
    """
    import os

    global _OFFLINE
    if _OFFLINE or os.environ.get("HF_HUB_OFFLINE") == "1":
        # try a cache-only lookup, never the network
        try:
            from huggingface_hub import hf_hub_download

            return Path(
                hf_hub_download(
                    repo_id=repo_id, filename=filename,
                    cache_dir=str(_CACHE_DIR), local_files_only=True,
                )
            )
        except Exception:
            return None
    try:
        from huggingface_hub import hf_hub_download

        return Path(
            hf_hub_download(
                repo_id=repo_id, filename=filename,
                cache_dir=str(_CACHE_DIR),
                etag_timeout=3,
            )
        )
    except Exception as e:  # offline, 404, ...
        _OFFLINE = True
        logger.warning(
            f"Could not download {filename} from {repo_id} ({type(e).__name__})."
            " Falling back to random initialisation."
        )
        return None


def load_state_dict(path):
    """Load a torch checkpoint into a flat {name: np.ndarray} dict."""
    import torch

    try:
        # safe path first: most zoo checkpoints are plain tensor dicts
        ckpt = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception:
        # some upstream files pickle configs/namespaces alongside tensors
        ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("state_dict", "model_state_dict", "model"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()
            if hasattr(v, "detach")}


def conv_w(t):
    """torch conv weight (cout, cin, kh, kw) → HWIO (kh, kw, cin, cout)."""
    return jnp.asarray(np.transpose(t, (2, 3, 1, 0)))


def linear_w(t):
    """torch linear weight (dout, din) → (din, dout)."""
    return jnp.asarray(np.transpose(t))


def conv1d_w(t):
    """torch 1×1 Conv1d weight (cout, cin, 1) → linear (cin, cout)."""
    return jnp.asarray(np.transpose(t[..., 0]))


def vec(t):
    return jnp.asarray(t)


def state_dict_to_tree(sd, rules):
    """Convert a flat torch state_dict into a nested param tree.

    ``rules``: list of (regex, kind) where kind ∈ {conv, linear, vec}.
    The first matching rule decides the transform; the torch dotted path
    becomes the nested dict path with the trailing ``weight``/``bias``
    mapped to ``w``/``b`` (or scale/bias/mean/var for norm layers).
    """
    tree = {}
    norm_map = {
        "weight": "scale", "bias": "bias",
        "running_mean": "mean", "running_var": "var",
    }
    for name, arr in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        kind = None
        for pattern, k in rules:
            if re.match(pattern, name):
                kind = k
                break
        if kind is None:
            continue
        parts = name.split(".")
        leaf = parts[-1]
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if kind == "conv":
            node["w" if leaf == "weight" else "b"] = (
                conv_w(arr) if leaf == "weight" else vec(arr)
            )
        elif kind == "linear":
            node["w" if leaf == "weight" else "b"] = (
                linear_w(arr) if leaf == "weight" else vec(arr)
            )
        elif kind == "conv1d":
            node["w" if leaf == "weight" else "b"] = (
                conv1d_w(arr) if leaf == "weight" else vec(arr)
            )
        elif kind == "norm":
            node[norm_map.get(leaf, leaf)] = vec(arr)
        else:  # raw vector / tensor
            node[leaf] = vec(arr)
    return tree


def convert_state_dict_auto(sd, list_keys=()):
    """Rank-based automatic torch→JAX state_dict conversion.

    No per-model rules: the transform is inferred per tensor —
    4-D → conv (OIHW→HWIO), 3-D → conv1d, 2-D → linear (transpose),
    1-D → batch-norm stats when a sibling ``running_mean`` exists
    (weight/bias/running_mean/running_var → scale/bias/mean/var), else
    layer-norm/affine (weight→scale) or a raw vector. ``list_keys`` names
    subtrees whose integer-keyed children become Python lists (layer
    stacks, e.g. ``("layers",)``).

    This is the shared engine behind per-model ``load_params`` functions;
    models whose param trees mirror the torch names need nothing else.
    """
    norm_map = {"weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var"}
    tree = {}
    for name, arr in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        parts = name.split(".")
        leaf = parts[-1]
        prefix = ".".join(parts[:-1])
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if getattr(arr, "ndim", 0) == 4:
            node["w" if leaf == "weight" else "b"] = conv_w(arr)
        elif getattr(arr, "ndim", 0) == 3:
            node["w" if leaf == "weight" else "b"] = conv1d_w(arr)
        elif getattr(arr, "ndim", 0) == 2:
            node["w" if leaf == "weight" else "b"] = linear_w(arr)
        elif f"{prefix}.running_mean" in sd:
            node[norm_map[leaf]] = vec(arr)
        elif leaf == "weight":
            node["scale"] = vec(arr)
        elif leaf == "bias":
            # a 1-D sibling `weight` marks a norm affine pair
            # (scale/bias); otherwise this is a conv/linear bias → b
            w = sd.get(f"{prefix}.weight")
            node["bias" if getattr(w, "ndim", 0) == 1 else "b"] = vec(arr)
        else:
            node[leaf] = vec(arr)

    def listify(node):
        if not isinstance(node, dict):
            return node
        out = {k: listify(v) for k, v in node.items()}
        for key in list_keys:
            sub = out.get(key)
            if isinstance(sub, dict) and sub and \
                    all(k.isdigit() for k in sub):
                out[key] = [listify(sub[str(i)])
                            for i in range(len(sub))]
        return out

    return listify(tree)


def tree_shapes(tree, prefix=""):
    """Flatten a param tree into {path: shape} for conversion checks.
    Handles dicts and lists (layer stacks) of subtrees."""
    out = {}
    items = tree.items() if isinstance(tree, dict) else enumerate(tree)
    for k, v in items:
        path = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, (dict, list)):
            out.update(tree_shapes(v, path))
        else:
            out[path] = tuple(v.shape)
    return out


def assert_tree_matches(converted, initialised, name=""):
    """Check a converted checkpoint covers the model's param tree exactly."""
    cs, es = tree_shapes(converted), tree_shapes(initialised)
    missing = set(es) - set(cs)
    extra = set(cs) - set(es)
    mismatched = {k for k in set(cs) & set(es) if cs[k] != es[k]}
    if missing or extra or mismatched:
        raise ValueError(
            f"weight conversion mismatch for {name}: missing={sorted(missing)[:5]}"
            f" extra={sorted(extra)[:5]} shape-mismatch="
            f"{[(k, cs[k], es[k]) for k in sorted(mismatched)[:5]]}"
        )
