"""InLoc RGB-D localization (reference contract:
imcui/hloc/localize_inloc.py:17-179 — per-query retrieval matches lifted to
3D via the database scans' depth, then PnP).

The reference interpolates 3-D points from InLoc's .mat RGB-D scans
(scipy.io). Here the scan reader is kept (scipy is available) and the pose
solver is the on-device PnP (ops/pnp.py)."""

import pickle
from pathlib import Path

import numpy as np

from .. import logger
from ..utils.geometry import rotmat2qvec
from ..utils.io import get_keypoints, get_matches, parse_retrieval


def interpolate_scan(scan, kp):
    """Bilinear 3-D interpolation into an InLoc scan (reference parity:
    localize_inloc.py:17-50). scan: (H, W, 3) xyz; kp: (N, 2) pixels."""
    h, w, c = scan.shape
    kp = kp / np.array([[w - 1, h - 1]]) * 2 - 1
    assert np.all(kp > -1) and np.all(kp < 1)
    # bilinear by hand
    gx = (kp[:, 0] + 1) * 0.5 * (w - 1)
    gy = (kp[:, 1] + 1) * 0.5 * (h - 1)
    x0 = np.clip(np.floor(gx).astype(int), 0, w - 1)
    y0 = np.clip(np.floor(gy).astype(int), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    wx = gx - x0
    wy = gy - y0
    corners = np.stack(
        [scan[y0, x0], scan[y0, x1], scan[y1, x0], scan[y1, x1]], 1
    )  # (N, 4, 3)
    valid = ~np.any(np.isnan(corners), axis=(1, 2))
    weights = np.stack(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], 1
    )
    xyz = (corners * weights[..., None]).sum(1)
    return xyz, valid


def get_scan_pose(dataset_dir, rpath):
    """Reference parity: localize_inloc.py:53-76 — alignment of DUC scans."""
    if "cse" in rpath:
        alignment_path = (
            Path(dataset_dir) / "database/alignments" / rpath.split("/")[1]
            / "transformations/cse_transformation.txt"
        )
    else:
        alignment_path = (
            Path(dataset_dir) / "database/alignments" / rpath.split("/")[1]
            / "transformations/DUC_transformation.txt"
        )
    with open(alignment_path) as f:
        raw = f.readlines()[7:11]
    P_after_GICP = np.array(
        [np.fromstring(ln, sep=" ") for ln in raw]
    )
    return P_after_GICP


def pose_from_scan_cluster(dataset_dir, q, retrieved, feature_file,
                           match_file, skip=None):
    """Accumulate 2D-3D via scan depth + solve PnP on device (reference
    parity: localize_inloc.py:79-125)."""
    import jax
    import jax.numpy as jnp
    import scipy.io

    from ..ops.pnp import ransac_pnp

    height, width = 1200, 1600  # InLoc query resolution
    cx, cy = 0.5 * width, 0.5 * height
    focal = 4032.0 * 28.0 / 36.0

    all_mkpq = []
    all_mkpr = []
    all_mkp3d = []
    all_indices = []
    kpq = get_keypoints(feature_file, q)
    num_matches = 0
    for i, r in enumerate(retrieved):
        kpr = get_keypoints(feature_file, r)
        pair = (q, r)
        m, _ = get_matches(match_file, *pair)
        if skip and (len(m) < skip):
            continue
        mkpq, mkpr = kpq[m[:, 0]], kpr[m[:, 1]]
        num_matches += len(mkpq)
        scan_r = scipy.io.loadmat(
            Path(dataset_dir) / r + ".mat"
        )["XYZcut"]
        mkp3d, valid = interpolate_scan(scan_r, mkpr)
        Tr = get_scan_pose(dataset_dir, r)
        mkp3d = mkp3d @ Tr[:3, :3].T + Tr[:3, 3]
        all_mkpq.append(mkpq[valid])
        all_mkpr.append(mkpr[valid])
        all_mkp3d.append(mkp3d[valid])
        all_indices.append(np.full(np.count_nonzero(valid), i))
    if not all_mkpq:
        return None, None, None, None, {"num_matches": 0}
    all_mkpq = np.concatenate(all_mkpq)
    all_mkpr = np.concatenate(all_mkpr)
    all_mkp3d = np.concatenate(all_mkp3d)
    all_indices = np.concatenate(all_indices)

    K = np.array([[focal, 0, cx], [0, focal, cy], [0, 0, 1]], np.float32)
    n = len(all_mkpq)
    n_pad = max(64, int(2 ** np.ceil(np.log2(max(n, 1)))))
    p2 = np.zeros((n_pad, 2), np.float32)
    p3 = np.zeros((n_pad, 3), np.float32)
    mask = np.zeros((n_pad,), bool)
    p2[:n], p3[:n], mask[:n] = all_mkpq, all_mkp3d, True
    ret = ransac_pnp(
        jax.random.PRNGKey(0), jnp.asarray(p2), jnp.asarray(p3),
        jnp.asarray(mask), jnp.asarray(K), threshold_px=48.0,
        num_hypotheses=1024,
    )
    ret = {
        "success": bool(ret["success"]),
        "qvec": rotmat2qvec(np.asarray(ret["R"], np.float64)),
        "tvec": np.asarray(ret["t"], np.float64),
        "num_inliers": int(ret["num_inliers"]),
    }
    logs = {"num_matches": num_matches}
    return all_mkpq, all_mkpr, all_mkp3d, ret, logs


def main(dataset_dir, retrieval, features, matches, results,
         skip_matches=None):
    """Reference parity: imcui/hloc/localize_inloc.py:128-179."""
    assert Path(retrieval).exists(), retrieval
    assert Path(features).exists(), features
    assert Path(matches).exists(), matches

    retrieval_dict = parse_retrieval(retrieval)
    queries = list(retrieval_dict.keys())

    poses = {}
    logs = {
        "features": str(features), "matches": str(matches),
        "retrieval": str(retrieval), "loc": {},
    }
    logger.info("Starting localization...")
    for q in queries:
        db = retrieval_dict[q]
        mkpq, mkpr, mkp3d, ret, log = pose_from_scan_cluster(
            dataset_dir, q, db, features, matches, skip_matches
        )
        if ret is not None and ret["success"]:
            poses[q] = (ret["qvec"], ret["tvec"])
        logs["loc"][q] = {**log, "db": db, "PnP_ret": ret}

    logger.info(f"Writing poses to {results}...")
    with open(results, "w") as f:
        for q in poses:
            qvec, tvec = poses[q]
            qvec = " ".join(map(str, qvec))
            tvec = " ".join(map(str, tvec))
            name = q.split("/")[-1]
            f.write(f"{name} {qvec} {tvec}\n")
    with open(f"{results}_logs.pkl", "wb") as f:
        pickle.dump(logs, f)
    logger.info("Done!")
    return poses, logs
