"""Pose-based pair generation (reference contract:
imcui/hloc/pairs_from_poses.py:15-60 — camera-center distance top-k with a
principal-axis angle gate of 30°)."""

import numpy as np
import scipy.spatial

from .. import logger
from ..utils.read_write_model import read_images_binary
from .pairs_from_retrieval import pairs_from_score_matrix

DEFAULT_ROT_THRESH = 30  # degrees


def get_pairwise_distances(images):
    ids = np.array(list(images.keys()))
    Rs = []
    ts = []
    for id_ in ids:
        image = images[id_]
        R = image.qvec2rotmat()
        t = image.tvec
        Rs.append(R)
        ts.append(t)
    Rs = np.stack(Rs, 0)
    ts = np.stack(ts, 0)

    # camera centers: C = -R^T t
    centers = -(Rs.transpose(0, 2, 1) @ ts[:, :, None])[:, :, 0]
    dist = scipy.spatial.distance.squareform(
        scipy.spatial.distance.pdist(centers)
    )

    # principal axis = third row of R (world direction of optical axis)
    axes = Rs[:, 2]
    dots = np.einsum("mi,ni->mn", axes, axes, optimize=False)
    dR = np.rad2deg(np.arccos(np.clip(dots, -1.0, 1.0)))
    return ids, dist, dR


def main(model, output, num_matched, rotation_threshold=DEFAULT_ROT_THRESH):
    logger.info("Reading the COLMAP model...")
    images = read_images_binary(str(model) + "/images.bin") \
        if not hasattr(model, "joinpath") else \
        read_images_binary(model / "images.bin")

    logger.info("Obtaining pairwise distances between"
                f" {len(images)} images...")
    ids, dist, dR = get_pairwise_distances(images)
    scores = -dist

    invalid = dR >= rotation_threshold
    np.fill_diagonal(invalid, True)
    pairs = pairs_from_score_matrix(scores, invalid, num_matched)
    pairs = [(images[ids[i]].name, images[ids[j]].name) for i, j in pairs]

    logger.info(f"Found {len(pairs)} pairs.")
    with open(output, "w") as f:
        f.write("\n".join(" ".join(p) for p in pairs))
    return pairs
