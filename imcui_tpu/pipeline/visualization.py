"""SfM model visualization (reference contract:
imcui/hloc/visualization.py:19-78 — visualize_sfm_2d with the same coloring
modes, plus visualize_loc over localization logs)."""

import pickle
import random

import numpy as np

from ..ui.viz import add_text, fig2im, plot_images, plot_keypoints
from ..utils.image import read_image
from ..utils.io import get_keypoints
from ..utils.read_write_model import read_model


def cm_RdGn(x):
    """Red (0) → green (1) colormap."""
    x = np.clip(np.asarray(x, float), 0, 1)[..., None] * 2
    c = x * np.array([[0, 1.0, 0]]) + (2 - x) * np.array([[1.0, 0, 0]])
    return np.clip(c, 0, 1)


def visualize_sfm_2d(reconstruction, image_dir, color_by="visibility",
                     selected=(), n=1, seed=0, dpi=75):
    """Reference parity: imcui/hloc/visualization.py:19-78. ``reconstruction``
    is a model directory (read via utils/read_write_model)."""
    assert image_dir is not None
    cameras, images, points3D = read_model(reconstruction)

    if not selected:
        image_ids = list(images.keys())
        selected = random.Random(seed).sample(
            image_ids, min(n, len(image_ids))
        )

    outputs = []
    for i in selected:
        image = images[i]
        keypoints = np.asarray(image.xys)
        visible = np.asarray(image.point3D_ids) != -1

        if color_by == "visibility":
            color = [(0, 0, 1.0) if v else (1.0, 0, 0) for v in visible]
            text = f"visible: {np.count_nonzero(visible)}/{len(visible)}"
        elif color_by == "track_length":
            tl = np.array(
                [
                    len(points3D[j].image_ids) if j != -1 else 1
                    for j in image.point3D_ids
                ]
            )
            max_, med_ = np.max(tl), np.median(tl[tl > 1]) if \
                (tl > 1).any() else (2, 2)
            tl = np.log(tl)
            color = cm_RdGn(tl / np.log(max_)).tolist()
            text = f"max/median track length: {max_}/{med_}"
        elif color_by == "depth":
            p3ids = image.point3D_ids[visible]
            z = np.array(
                [
                    (qvec2rotmat_cached(image) @ points3D[j].xyz
                     + image.tvec)[-1]
                    for j in p3ids
                ]
            )
            z -= z.min()
            color = cm_RdGn(z / np.percentile(z, 99.9)).tolist()
            text = f"visible: {np.count_nonzero(visible)}/{len(visible)}"
            keypoints = keypoints[visible]
        else:
            raise NotImplementedError(f"Coloring not implemented: {color_by}")

        name = image.name
        fig = plot_images([read_image(image_dir / name)], dpi=dpi)
        plot_keypoints([keypoints], colors=[color], ps=4)
        add_text(0, text)
        add_text(0, name, pos=(0.01, 0.01), fs=5, lcolor=None, va="bottom")
        outputs.append(fig2im(fig))
    return outputs


def qvec2rotmat_cached(image):
    return image.qvec2rotmat()


def visualize_loc(results, image_dir, reconstruction=None, db_image_dir=None,
                  selected=(), n=1, seed=0, prefix=None, **kwargs):
    """Reference parity: imcui/hloc/visualization.py visualize_loc."""
    assert image_dir is not None
    with open(f"{results}_logs.pkl", "rb") as f:
        logs = pickle.load(f)

    if not selected:
        queries = list(logs["loc"].keys())
        if prefix:
            queries = [q for q in queries if q.startswith(prefix)]
        selected = random.Random(seed).sample(queries, min(n, len(queries)))

    cameras = images = points3D = None
    if reconstruction is not None:
        cameras, images, points3D = read_model(reconstruction)

    outputs = []
    for qname in selected:
        loc = logs["loc"][qname]
        inliers = np.asarray(
            loc.get("PnP_ret", {}).get("inliers", [])
        )
        n_matches = loc.get("num_matches", 0)
        fig = plot_images([read_image(image_dir / qname)], dpi=75)
        add_text(0, f"matches: {n_matches}, inliers: "
                    f"{int(inliers.sum()) if inliers.size else 0}")
        add_text(0, qname, pos=(0.01, 0.01), fs=5, lcolor=None, va="bottom")
        outputs.append(fig2im(fig))
    return outputs
