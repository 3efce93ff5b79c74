"""Fused two-view matching step — the serving hot path, one XLA program.

The reference's hot path (reference call stack: imcui/ui/utils.py:832
run_matching → extract ×2 → match → RANSAC) crosses the host/device
boundary after every stage (`.cpu().numpy()` at match_features.py:236-243)
and runs RANSAC on the CPU. Here the whole pipeline — SuperPoint trunk,
keypoint heads, LightGlue, geometric verification — is ONE jitted function
over a pair batch: nothing leaves the device, XLA fuses across stages, and
the batch axis shards over a device mesh for multi-chip serving
(parallel/mesh.py).
"""

import functools

import jax
import jax.numpy as jnp

from ..models.extractors import superpoint as sp
from ..models.matchers import lightglue as lg
from ..ops import ransac as ransac_ops


def init_params(rng=None, n_layers=9, max_keypoints=1024):
    """Flagship-model parameters (SuperPoint + LightGlue)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    lg_conf = {
        "features": "superpoint",
        "descriptor_dim": 256,
        "num_heads": 4,
        "n_layers": n_layers,
        "add_scale_ori": False,
    }
    return {
        "superpoint": sp.init_params(k1),
        "lightglue": lg.init_params(k2, lg_conf),
    }


def load_pretrained(n_layers=9, sp_npz=None, lg_npz=None):
    """Weights for the fused step: upstream checkpoints when an egress
    exists, else locally trained npz trees (weights/README.md) via
    sp_npz/lg_npz, else deterministic random init."""
    params = init_params(n_layers=n_layers)
    sp_params, sp_meta = sp.load_params(
        {"checkpoint_npz": str(sp_npz)} if sp_npz else {})
    lg_params, lg_meta = lg.load_params({
        "features": "superpoint", "descriptor_dim": 256, "num_heads": 4,
        "n_layers": n_layers, "model_name": "superpoint_lightglue.pth",
        **({"checkpoint_npz": str(lg_npz)} if lg_npz else {}),
    })
    params["superpoint"] = sp_params
    params["lightglue"] = lg_params
    return params, {"superpoint": sp_meta, "lightglue": lg_meta}


def match_step(
    params,
    image0,
    image1,
    valid_wh0,
    valid_wh1,
    key,
    *,
    max_keypoints=1024,
    nms_radius=4,
    keypoint_threshold=0.0005,
    n_layers=9,
    match_threshold=0.1,
    num_heads=4,
    ransac="fundamental",
    ransac_threshold=4.0,
    num_hypotheses=512,
    precision="bf16",
):
    """Pair batch in, verified matches out. All shapes static.

    image0/1: (B, 1, H, W); valid_wh0/1: (B, 2); key: PRNG for RANSAC.
    Returns dict with keypoints0/1 (B,N,2), matches0 (B,N), mask0/1,
    matching_scores0, inliers (B,N), M (B,3,3), num_inliers (B,).
    """
    b = image0.shape[0]
    # one batched extractor pass over both images (2B on the MXU at once
    # when shapes agree; two passes otherwise)
    if image0.shape == image1.shape:
        images = jnp.concatenate([image0, image1], 0)
        valid = jnp.concatenate([valid_wh0, valid_wh1], 0)
        feats = sp.apply(
            params["superpoint"], images, valid,
            nms_radius=nms_radius, max_keypoints=max_keypoints,
            keypoint_threshold=keypoint_threshold, precision=precision,
        )
        f0 = {k: v[:b] for k, v in feats.items()}
        f1 = {k: v[b:] for k, v in feats.items()}
    else:
        f0 = sp.apply(params["superpoint"], image0, valid_wh0,
                      nms_radius=nms_radius, max_keypoints=max_keypoints,
                      keypoint_threshold=keypoint_threshold,
                      precision=precision)
        f1 = sp.apply(params["superpoint"], image1, valid_wh1,
                      nms_radius=nms_radius, max_keypoints=max_keypoints,
                      keypoint_threshold=keypoint_threshold,
                      precision=precision)

    lg_conf = {
        "num_heads": num_heads,
        "match_threshold": match_threshold,
        "add_scale_ori": False,
        "features": "superpoint",
        # NOTE: LightGlue stays fp32 here — measured 8.2 ms (bf16) vs
        # 7.1 ms (fp32) at B=4/N=1024: the axon runtime compiles with
        # --xla_allow_excess_precision, so f32 matmuls already run at
        # bf16 MXU rate and explicit casts only add VPU passes.
        "precision": "fp32",
    }
    matcher = functools.partial(lg.forward_pair, conf=lg_conf)
    matched = jax.vmap(
        lambda k0, k1, d0, d1, m0, m1, s0, s1: matcher(
            params["lightglue"], k0, k1, d0, d1, m0, m1, s0, s1
        )
    )(
        f0["keypoints"], f1["keypoints"],
        f0["descriptors"].transpose(0, 2, 1),
        f1["descriptors"].transpose(0, 2, 1),
        f0["mask"], f1["mask"],
        valid_wh0.astype(jnp.float32), valid_wh1.astype(jnp.float32),
    )

    out = {
        "keypoints0": f0["keypoints"],
        "keypoints1": f1["keypoints"],
        "scores0": f0["scores"],
        "scores1": f1["scores"],
        "mask0": f0["mask"],
        "mask1": f1["mask"],
        "matches0": matched["matches0"],
        "matching_scores0": matched["matching_scores0"],
    }

    if ransac is not None:
        # build correspondence arrays: slot i ↦ (kpt0[i], kpt1[matches0[i]])
        def gather_pair(k0, k1, m0):
            idx = jnp.clip(m0, 0, k1.shape[0] - 1)
            return k0, jnp.take(k1, idx, axis=0), m0 > -1

        p0, p1, valid = jax.vmap(gather_pair)(
            out["keypoints0"], out["keypoints1"], out["matches0"]
        )
        keys = jax.random.split(key, b)
        verify = functools.partial(
            ransac_ops.ransac, model=ransac, threshold=ransac_threshold,
            num_hypotheses=num_hypotheses,
        )
        ver = jax.vmap(verify)(keys, p0, p1, valid)
        out.update(
            {
                "inliers": ver["inliers"],
                "M": ver["M"],
                "num_inliers": ver["num_inliers"],
                "mkeypoints0": p0,
                "mkeypoints1": p1,
            }
        )
    return out


def make_jitted_step(**static_kwargs):
    """Return a jitted match_step with the given static config baked in."""
    fn = functools.partial(match_step, **static_kwargs)
    return jax.jit(fn)
