"""MegaDepth-1500 relative-pose evaluation harness.

The north-star accuracy metric for the rebuild (BASELINE.md): pose
AUC@5°/10°/20° over the MegaDepth-1500 test pairs. The reference has no
in-repo eval; upstream matchers report this via their own scripts. Here the
whole chain — match → on-device fundamental RANSAC → essential →
pose recovery → angular errors — runs batched on the TPU; only image
loading stays on the host.

Pair-list format: a JSON file with entries
  {"img0": path, "img1": path, "K0": 3x3, "K1": 3x3,
   "R": 3x3, "t": [3]}          # T_0to1 ground truth
(a converter for the upstream ``megadepth_test_1500`` npz scene indices is
provided in ``convert_scene_info``).
"""

import json
from pathlib import Path

import numpy as np

from .. import logger
from ..ops import pose as pose_ops


def convert_scene_info(scene_info_npz, image_root, output_json):
    """Convert an upstream MegaDepth scene_info npz (pair_infos, poses,
    intrinsics arrays) into the flat JSON pair list."""
    info = np.load(scene_info_npz, allow_pickle=True)
    pairs = []
    poses = info["poses"]
    intrinsics = info["intrinsics"]
    image_paths = info["image_paths"]
    for pair_info in info["pair_infos"]:
        (idx0, idx1) = pair_info[0]
        T0 = poses[idx0]
        T1 = poses[idx1]
        T_0to1 = T1 @ np.linalg.inv(T0)
        pairs.append(
            {
                "img0": str(Path(image_root) / str(image_paths[idx0])),
                "img1": str(Path(image_root) / str(image_paths[idx1])),
                "K0": np.asarray(intrinsics[idx0]).tolist(),
                "K1": np.asarray(intrinsics[idx1]).tolist(),
                "R": T_0to1[:3, :3].tolist(),
                "t": T_0to1[:3, 3].tolist(),
            }
        )
    with open(output_json, "w") as f:
        json.dump(pairs, f)
    return pairs


def evaluate_pairs(matcher_fn, pairs, ransac_threshold_px=0.5,
                   num_hypotheses=2048, max_pairs=None):
    """Run the eval. ``matcher_fn(img0_path, img1_path)`` must return
    (mkpts0, mkpts1) in original-resolution pixels.

    Returns dict with aucs @5/10/20, precision stats, per-pair errors.
    """
    import jax
    import jax.numpy as jnp

    errors = []
    n_matches = []
    for i, pair in enumerate(pairs if max_pairs is None
                             else pairs[:max_pairs]):
        mkpts0, mkpts1 = matcher_fn(pair["img0"], pair["img1"])
        n = len(mkpts0)
        n_matches.append(n)
        if n < 8:
            errors.append(180.0)
            continue
        n_pad = max(64, int(2 ** np.ceil(np.log2(n))))
        p0 = np.zeros((n_pad, 2), np.float32)
        p1 = np.zeros((n_pad, 2), np.float32)
        mask = np.zeros((n_pad,), bool)
        p0[:n], p1[:n], mask[:n] = mkpts0, mkpts1, True
        out = pose_ops.estimate_pose(
            jax.random.PRNGKey(i), jnp.asarray(p0), jnp.asarray(p1),
            jnp.asarray(mask),
            jnp.asarray(pair["K0"], dtype=jnp.float32),
            jnp.asarray(pair["K1"], dtype=jnp.float32),
            threshold_px=ransac_threshold_px,
            num_hypotheses=num_hypotheses,
        )
        err = float(
            pose_ops.pose_error(
                out["R"], out["t"],
                jnp.asarray(pair["R"], dtype=jnp.float32),
                jnp.asarray(pair["t"], dtype=jnp.float32),
            )
        )
        errors.append(err)
        if (i + 1) % 100 == 0:
            logger.info(f"evaluated {i + 1} pairs")

    aucs = pose_ops.pose_auc(errors, thresholds=(5.0, 10.0, 20.0))
    return {
        "auc@5": aucs[0],
        "auc@10": aucs[1],
        "auc@20": aucs[2],
        "median_err_deg": float(np.median(errors)),
        "mean_matches": float(np.mean(n_matches)) if n_matches else 0.0,
        "errors": errors,
    }


def api_matcher_fn(api):
    """Adapt an ImageMatchingAPI instance into the matcher_fn protocol."""
    from ..utils.image import read_image

    def fn(path0, path1):
        pred = api(read_image(path0), read_image(path1))
        return (np.asarray(pred["mkeypoints0_orig"]),
                np.asarray(pred["mkeypoints1_orig"]))

    return fn


def evaluate_matcher(pairs, matcher="superpoint+lightglue",
                     max_pairs=None, ransac_threshold_px=0.75,
                     feature_opts=None, matcher_opts=None):
    """Evaluate a named zoo matcher on a pair list (real MegaDepth or
    eval/synthpose synthetic-pose pairs — same schema).

    ``feature_opts`` / ``matcher_opts``: shallow model-conf overrides
    (e.g. ``{"subpixel": True}`` to enable SuperPoint's soft-argmax
    peak refinement — r5: quantised peak localisation dominated
    relative-pose error, BASELINE.md "Pose AUC")."""
    import copy

    from ..api.core import ImageMatchingAPI
    from ..ui.utils import get_matcher_zoo, load_config
    from ..cli.main import get_default_config_path

    cfg = load_config(get_default_config_path())
    zoo = get_matcher_zoo(cfg["matcher_zoo"])
    conf = copy.deepcopy(zoo[matcher])
    conf["ransac"] = {"enable": False}
    if feature_opts and "feature" in conf:
        conf["feature"]["model"].update(feature_opts)
    if matcher_opts and "matcher" in conf:
        conf["matcher"]["model"].update(matcher_opts)
    api = ImageMatchingAPI(conf=conf)
    return evaluate_pairs(api_matcher_fn(api), pairs,
                          ransac_threshold_px=ransac_threshold_px,
                          max_pairs=max_pairs)


def main(pairs_json, matcher="superpoint+lightglue", max_pairs=None,
         output=None):
    """CLI entry: evaluate a zoo matcher on a converted pair list."""
    with open(pairs_json) as f:
        pairs = json.load(f)
    result = evaluate_matcher(pairs, matcher, max_pairs=max_pairs)
    summary = {k: v for k, v in result.items() if k != "errors"}
    logger.info(f"MegaDepth eval [{matcher}]: {summary}")
    if output:
        with open(output, "w") as f:
            json.dump(result, f)
    return result


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("pairs_json")
    p.add_argument("--matcher", default="superpoint+lightglue")
    p.add_argument("--max-pairs", type=int, default=None)
    p.add_argument("--output", default=None)
    args = p.parse_args()
    main(args.pairs_json, args.matcher, args.max_pairs, args.output)
