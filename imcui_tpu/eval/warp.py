"""Synthetic-homography accuracy evaluation — runs fully offline.

The MegaDepth harness (eval/megadepth.py) needs data egress; this gate
does not: it warps a real image by known homographies (rotation / scale /
perspective, the same family as ui/examples.py) and measures, end-to-end
through ``ImageMatchingAPI``:

- **match recall**: fraction of predicted matches whose ground-truth
  transfer error ``|H·x0 − x1|`` is under a pixel threshold;
- **homography error**: mean corner displacement between the RANSAC
  estimate and the known H.

Weight-free pipelines (sift, dog+rootsift) must clear real thresholds
today; learned models auto-enroll in tests as their conversions land
(gated on ``meta['pretrained']``). Reference bar: real matches on real
photos (VERDICT r1 "measured accuracy, anywhere").
"""

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def make_homographies(w, h, angles=(10.0, -15.0), scales=(0.85, 1.15),
                      perspective=0.0005):
    """A small battery of invertible warps around the image center."""
    hs = []
    for a in angles:
        hs.append(np.vstack([
            cv2.getRotationMatrix2D((w / 2, h / 2), a, 1.0), [0, 0, 1]
        ]).astype(np.float64))
    for s in scales:
        hs.append(np.vstack([
            cv2.getRotationMatrix2D((w / 2, h / 2), 0.0, s), [0, 0, 1]
        ]).astype(np.float64))
    hp = np.eye(3)
    hp[2, 0] = perspective
    hs.append(hp)
    return hs


def warp_image(image, H):
    h, w = image.shape[:2]
    return cv2.warpPerspective(image, H, (w, h))


def transfer_error(kpts0, kpts1, H):
    """|H·x0 − x1| per match, in pixels."""
    x = np.concatenate([kpts0, np.ones((len(kpts0), 1))], 1) @ H.T
    x = x[:, :2] / np.maximum(np.abs(x[:, 2:]), 1e-12) * np.sign(x[:, 2:])
    return np.linalg.norm(x - kpts1, axis=1)


def corner_error(H_est, H_true, w, h):
    """Mean displacement of the four image corners under est vs truth."""
    corners = np.array([[0, 0, 1], [w, 0, 1], [w, h, 1], [0, h, 1]],
                       np.float64)

    def apply(H):
        x = corners @ np.asarray(H, np.float64).T
        return x[:, :2] / x[:, 2:]

    return float(np.linalg.norm(apply(H_est) - apply(H_true), axis=1)
                 .mean())


def evaluate_warp(api, image, homographies=None, px_thresh=3.0):
    """Run the API over (image, warp(image)) pairs.

    Returns per-warp dicts with n_matches / recall / h_corner_err, plus
    an 'aggregate' entry with medians. ``image``: HxWx3 uint8/float RGB.
    """
    h, w = image.shape[:2]
    if homographies is None:
        homographies = make_homographies(w, h)
    results = []
    for H in homographies:
        warped = warp_image(image, H)
        pred = api(image, warped)
        k0 = np.asarray(pred["mmkeypoints0_orig"], np.float64)
        k1 = np.asarray(pred["mmkeypoints1_orig"], np.float64)
        entry = {"n_matches": int(len(k0)), "recall": 0.0,
                 "h_corner_err": float("inf")}
        if len(k0) >= 4:
            err = transfer_error(k0, k1, H)
            entry["recall"] = float((err < px_thresh).mean())
            H_est = pred.get("geom_info", {}).get("Homography")
            if H_est is not None:
                entry["h_corner_err"] = corner_error(H_est, H, w, h)
        results.append(entry)
    agg = {
        "median_recall": float(np.median([r["recall"] for r in results])),
        "median_matches": float(np.median(
            [r["n_matches"] for r in results])),
        "median_h_corner_err": float(np.median(
            [r["h_corner_err"] for r in results])),
    }
    return results, agg
