"""Application-layer orchestration: model zoo resolution, geometric
verification, warping (reference contract: imcui/ui/utils.py — same
function names, same pred keys in/out).

TPU-first change: the default RANSAC estimator is the on-device batched
LO-RANSAC (``TPU_LORANSAC``, ops/ransac.py) instead of the reference's
CPU OpenCV USAC (imcui/ui/utils.py:1100-1110); the CV2 zoo remains
available for parity/POSELIB-style use cases.
"""

import pickle
from pathlib import Path
from typing import Any, Dict, Optional

import cv2
import numpy as np

from .. import logger
from ..configs import confs_dict
from ..models import extractors as extractors_mod
from ..models import matchers as matchers_mod
from ..utils.base_model import dynamic_load

DEFAULT_SETTING_THRESHOLD = 0.1
DEFAULT_SETTING_MAX_FEATURES = 2000
DEFAULT_DEFAULT_KEYPOINT_THRESHOLD = 0.01
DEFAULT_ENABLE_RANSAC = True
DEFAULT_RANSAC_METHOD = "TPU_LORANSAC"
DEFAULT_RANSAC_REPROJ_THRESHOLD = 8
DEFAULT_RANSAC_CONFIDENCE = 0.9999
DEFAULT_RANSAC_MAX_ITER = 10000
DEFAULT_MIN_NUM_MATCHES = 4
DEFAULT_MATCHING_THRESHOLD = 0.2
DEFAULT_SETTING_GEOMETRY = "Homography"

# name → estimator (reference zoo: imcui/ui/utils.py:1100-1110, extended
# with the on-device TPU estimator as the default)
ransac_zoo = {
    "TPU_LORANSAC": "tpu",
    "CV2_RANSAC": cv2.RANSAC,
    "CV2_USAC_MAGSAC": cv2.USAC_MAGSAC,
    "CV2_USAC_DEFAULT": cv2.USAC_DEFAULT,
    "CV2_USAC_FM_8PTS": cv2.USAC_FM_8PTS,
    "CV2_USAC_PROSAC": cv2.USAC_PROSAC,
    "CV2_USAC_FAST": cv2.USAC_FAST,
    "CV2_USAC_ACCURATE": cv2.USAC_ACCURATE,
    "CV2_USAC_PARALLEL": cv2.USAC_PARALLEL,
}


def load_config(config_path):
    import yaml

    with open(config_path) as f:
        return yaml.safe_load(f)


def get_matcher_zoo(matcher_zoo):
    """Resolve enabled zoo entries (reference parity:
    imcui/ui/utils.py:76-93)."""
    out = {}
    for key, conf in matcher_zoo.items():
        if not conf.get("enable", True):
            continue
        out[key] = parse_match_config(conf)
    return out


def parse_match_config(conf):
    """String refs → conf dicts from the L2 registry (reference parity:
    imcui/ui/utils.py:96-109)."""
    from copy import deepcopy

    if conf.get("dense", False) or conf.get("standalone", False):
        dense_confs = confs_dict["matchers"]
        return {
            **conf,
            "matcher": deepcopy(dense_confs[conf["matcher"]]),
            "dense": True,
            "standalone": True,
        }
    return {
        **conf,
        "feature": deepcopy(confs_dict["extractors"][conf["feature"]]),
        "matcher": deepcopy(confs_dict["matchers"][conf["matcher"]]),
        "dense": False,
        "standalone": False,
    }


def get_model(match_conf):
    """Instantiate a matcher (reference parity: imcui/ui/utils.py:112-124)."""
    Model = dynamic_load(matchers_mod, match_conf["model"]["name"])
    return Model(match_conf["model"])


def get_feature_model(conf):
    """Instantiate an extractor (reference parity:
    imcui/ui/utils.py:127-139)."""
    Model = dynamic_load(extractors_mod, conf["model"]["name"])
    return Model(conf["model"])


def set_null_pred(feature_type: Optional[str], pred: dict):
    """Reference parity: imcui/ui/utils.py 'set_null_pred'."""
    if feature_type == "KEYPOINT":
        pred["mmkeypoints0_orig"] = np.array([])
        pred["mmkeypoints1_orig"] = np.array([])
        pred["mmconf"] = np.array([])
    elif feature_type == "LINE":
        pred["mline_keypoints0_orig"] = np.array([])
        pred["mline_keypoints1_orig"] = np.array([])
    pred["H"] = None
    pred["geom_info"] = {}
    return pred


def _tpu_ransac(kp0, kp1, reproj_threshold, max_iter, geometry_type):
    """On-device batched LO-RANSAC (ops/ransac.py) behind the cv2-shaped
    (M, mask) return convention."""
    import jax
    import jax.numpy as jnp

    from ..ops import ransac as ransac_ops

    model = "homography" if geometry_type == "Homography" else "fundamental"
    n = len(kp0)
    # bucket N for jit-cache friendliness
    n_pad = max(64, int(2 ** np.ceil(np.log2(n))))
    p0 = np.zeros((n_pad, 2), np.float32)
    p1 = np.zeros((n_pad, 2), np.float32)
    mask = np.zeros((n_pad,), bool)
    p0[:n], p1[:n], mask[:n] = kp0, kp1, True
    hyps = int(min(2048, max(256, max_iter // 4)))
    out = ransac_ops.ransac(
        jax.random.PRNGKey(0), jnp.asarray(p0), jnp.asarray(p1),
        jnp.asarray(mask), model=model,
        threshold=float(reproj_threshold), num_hypotheses=hyps,
    )
    M = np.asarray(out["M"], np.float64)
    inliers = np.asarray(out["inliers"])[:n]
    return M, inliers


def _filter_matches_opencv(kp0, kp1, method, reproj_threshold=3.0,
                           confidence=0.99, max_iter=2000,
                           geometry_type="Homography"):
    """Reference parity: imcui/ui/utils.py:326-379."""
    try:
        if geometry_type == "Homography":
            M, mask = cv2.findHomography(
                kp0, kp1, method=method,
                ransacReprojThreshold=reproj_threshold,
                confidence=confidence, maxIters=max_iter,
            )
        elif geometry_type == "Fundamental":
            M, mask = cv2.findFundamentalMat(
                kp0, kp1, method=method,
                ransacReprojThreshold=reproj_threshold,
                confidence=confidence, maxIters=max_iter,
            )
        else:
            raise NotImplementedError(geometry_type)
    except cv2.error:
        logger.error(f"cv2 RANSAC error, len(kp0): {len(kp0)}")
        return None, None
    if M is None or mask is None:
        return None, None
    return M, np.array(mask.ravel().astype(bool))


def proc_ransac_matches(mkpts0, mkpts1, ransac_method=DEFAULT_RANSAC_METHOD,
                        ransac_reproj_threshold=3.0, ransac_confidence=0.99,
                        ransac_max_iter=2000, geometry_type="Homography"):
    """Reference parity: imcui/ui/utils.py:424-456 (+ TPU estimator)."""
    if ransac_method.startswith("TPU"):
        return _tpu_ransac(mkpts0, mkpts1, ransac_reproj_threshold,
                           ransac_max_iter, geometry_type)
    if ransac_method.startswith("CV2"):
        return _filter_matches_opencv(
            mkpts0, mkpts1, ransac_zoo[ransac_method],
            ransac_reproj_threshold, ransac_confidence, ransac_max_iter,
            geometry_type,
        )
    raise NotImplementedError(ransac_method)


def compute_geometry(pred, ransac_method=DEFAULT_RANSAC_METHOD,
                     ransac_reproj_threshold=DEFAULT_RANSAC_REPROJ_THRESHOLD,
                     ransac_confidence=DEFAULT_RANSAC_CONFIDENCE,
                     ransac_max_iter=DEFAULT_RANSAC_MAX_ITER):
    """F + H + uncalibrated rectification (reference parity:
    imcui/ui/utils.py:532-610)."""
    mkpts0 = mkpts1 = None
    if "mkeypoints0_orig" in pred and "mkeypoints1_orig" in pred:
        mkpts0, mkpts1 = pred["mkeypoints0_orig"], pred["mkeypoints1_orig"]
    elif "line_keypoints0_orig" in pred and "line_keypoints1_orig" in pred:
        mkpts0 = pred["line_keypoints0_orig"]
        mkpts1 = pred["line_keypoints1_orig"]
    if mkpts0 is None or mkpts1 is None:
        return {}
    if len(mkpts0) < 2 * DEFAULT_MIN_NUM_MATCHES:
        return {}

    geo_info: Dict[str, Any] = {}
    F, mask_f = proc_ransac_matches(
        mkpts0, mkpts1, ransac_method, ransac_reproj_threshold,
        ransac_confidence, ransac_max_iter, geometry_type="Fundamental",
    )
    if F is not None:
        geo_info["Fundamental"] = F.tolist()
        geo_info["mask_f"] = mask_f
    H, mask_h = proc_ransac_matches(
        mkpts0, mkpts1, ransac_method, ransac_reproj_threshold,
        ransac_confidence, ransac_max_iter, geometry_type="Homography",
    )
    if "image0_orig" in pred and pred["image0_orig"] is not None:
        h0, w0 = pred["image0_orig"].shape[:2]
    else:
        w0 = int(np.ceil(mkpts0[:, 0].max())) + 1
        h0 = int(np.ceil(mkpts0[:, 1].max())) + 1
    if H is not None:
        geo_info["Homography"] = H.tolist()
        geo_info["mask_h"] = mask_h
        if F is not None:
            try:
                ret, H1, H2 = cv2.stereoRectifyUncalibrated(
                    mkpts0.reshape(-1, 2).astype(np.float64),
                    mkpts1.reshape(-1, 2).astype(np.float64),
                    np.asarray(F, np.float64), imgSize=(w0, h0),
                )
                # some builds signal failure via ret/None, not cv2.error
                if ret and H1 is not None and H2 is not None:
                    geo_info["H1"] = H1.tolist()
                    geo_info["H2"] = H2.tolist()
            except cv2.error as e:
                logger.error(f"StereoRectifyUncalibrated failed, skip! {e}")
    return geo_info


def filter_matches(pred, ransac_method=DEFAULT_RANSAC_METHOD,
                   ransac_reproj_threshold=DEFAULT_RANSAC_REPROJ_THRESHOLD,
                   ransac_confidence=DEFAULT_RANSAC_CONFIDENCE,
                   ransac_max_iter=DEFAULT_RANSAC_MAX_ITER,
                   ransac_estimator=None):
    """RANSAC filter (reference parity: imcui/ui/utils.py:459-529 — same
    output keys mmkeypoints*_orig / mmconf / H / geom_info)."""
    feature_type = None
    mkpts0 = mkpts1 = None
    if "mkeypoints0_orig" in pred and "mkeypoints1_orig" in pred:
        mkpts0, mkpts1 = pred["mkeypoints0_orig"], pred["mkeypoints1_orig"]
        feature_type = "KEYPOINT"
    elif "line_keypoints0_orig" in pred and "line_keypoints1_orig" in pred:
        mkpts0 = pred["line_keypoints0_orig"]
        mkpts1 = pred["line_keypoints1_orig"]
        feature_type = "LINE"
    else:
        return set_null_pred(feature_type, pred)
    if mkpts0 is None or mkpts1 is None:
        return set_null_pred(feature_type, pred)
    if ransac_method not in ransac_zoo:
        ransac_method = DEFAULT_RANSAC_METHOD
    if len(mkpts0) < DEFAULT_MIN_NUM_MATCHES:
        return set_null_pred(feature_type, pred)

    geom_info = compute_geometry(
        pred, ransac_method=ransac_method,
        ransac_reproj_threshold=ransac_reproj_threshold,
        ransac_confidence=ransac_confidence,
        ransac_max_iter=ransac_max_iter,
    )
    if "Homography" in geom_info:
        mask = np.asarray(geom_info["mask_h"])
        if feature_type == "KEYPOINT":
            pred["mmkeypoints0_orig"] = mkpts0[mask]
            pred["mmkeypoints1_orig"] = mkpts1[mask]
            pred["mmconf"] = pred["mconf"][mask]
        elif feature_type == "LINE":
            pred["mline_keypoints0_orig"] = mkpts0[mask]
            pred["mline_keypoints1_orig"] = mkpts1[mask]
        pred["H"] = np.array(geom_info["Homography"])
    else:
        set_null_pred(feature_type, pred)
    geom_info.pop("mask_h", None)
    geom_info.pop("mask_f", None)
    pred["geom_info"] = geom_info
    return pred


def wrap_images(img0, img1, geo_info, geom_type):
    """Homography warp / stereo rectification view (reference parity:
    imcui/ui/utils.py:613-665)."""
    from .viz import fig2im, plot_images

    h0, w0 = img0.shape[:2]
    h1, w1 = img1.shape[:2]
    if geo_info is None or len(geo_info) == 0:
        return None, None
    rectified_image0, rectified_image1 = img0, None
    if "Homography" not in geo_info:
        logger.warning(f"{geom_type} not exist, maybe too few matches")
        return None, None
    H = np.array(geo_info["Homography"])
    if geom_type == "Homography":
        H_inv = np.linalg.inv(H)
        rectified_image1 = cv2.warpPerspective(img1, H_inv, (w0, h0))
        title = ["Image 0", "Image 1 - warped"]
    elif geom_type == "Fundamental":
        if "H1" not in geo_info:
            logger.warning("Rectification matrices missing")
            return None, None
        H1, H2 = np.array(geo_info["H1"]), np.array(geo_info["H2"])
        rectified_image0 = cv2.warpPerspective(img0, H1, (w0, h0))
        rectified_image1 = cv2.warpPerspective(img1, H2, (w1, h1))
        title = ["Image 0 - warped", "Image 1 - warped"]
    else:
        raise ValueError(f"Unknown geometry type {geom_type}")
    fig = plot_images(
        [rectified_image0.squeeze(), rectified_image1.squeeze()], title,
        dpi=150,
    )
    return fig2im(fig), rectified_image1


def generate_warp_images(input_image0, input_image1, matches_info, choice):
    """Reference parity: imcui/ui/utils.py:668-700."""
    if (matches_info is None or len(matches_info) < 1
            or "geom_info" not in matches_info):
        return None, None
    geom_info = matches_info["geom_info"]
    if choice == "No":
        return None, None
    return wrap_images(input_image0, input_image1, geom_info, choice)


def run_matching(
    image0,
    image1,
    match_threshold=DEFAULT_MATCHING_THRESHOLD,
    extract_max_keypoints=DEFAULT_SETTING_MAX_FEATURES,
    keypoint_threshold=DEFAULT_DEFAULT_KEYPOINT_THRESHOLD,
    key="superpoint+lightglue",
    ransac_method=DEFAULT_RANSAC_METHOD,
    ransac_reproj_threshold=DEFAULT_RANSAC_REPROJ_THRESHOLD,
    ransac_confidence=DEFAULT_RANSAC_CONFIDENCE,
    ransac_max_iter=DEFAULT_RANSAC_MAX_ITER,
    choice_geometry_type=DEFAULT_SETTING_GEOMETRY,
    matcher_zoo=None,
    force_resize=False,
    image_width=640,
    image_height=480,
    use_cached_model=True,
):
    """Full per-request pipeline (reference call stack:
    imcui/ui/utils.py:832-1095 run_matching). Returns the final pred dict
    (the gradio generator wrapper lives in ui/app_class.py)."""
    from ..pipeline import extract_features, match_dense, match_features
    from .modelcache import get_global_cache

    if image0 is None or image1 is None:
        raise ValueError("Error: No images found! Please upload two images.")
    if matcher_zoo is None:
        raise ValueError("matcher_zoo is required")
    model = matcher_zoo[key]
    match_conf = model["matcher"]
    # update match config with UI values
    match_conf["model"]["match_threshold"] = match_threshold
    match_conf["model"]["max_keypoints"] = extract_max_keypoints

    cache = get_global_cache()
    matcher = cache.load_model(
        match_conf["model"]["name"], get_model, match_conf
    )
    if model["dense"]:
        pconf = match_conf.get("preprocessing", {})
        if force_resize:
            pconf = {**pconf, "force_resize": True,
                     "width": image_width, "height": image_height}
        pred = match_dense.match_images(matcher, image0, image1, pconf)
    else:
        extract_conf = model["feature"]
        extract_conf["model"]["max_keypoints"] = extract_max_keypoints
        extract_conf["model"]["keypoint_threshold"] = keypoint_threshold
        extractor = cache.load_model(
            extract_conf["model"]["name"], get_feature_model, extract_conf
        )
        pconf = extract_conf.get("preprocessing", {})
        if force_resize:
            pconf = {**pconf, "force_resize": True,
                     "width": image_width, "height": image_height}
        pred0 = extract_features.extract(extractor, image0, pconf)
        pred1 = extract_features.extract(extractor, image1, pconf)
        pred = match_features.match_images(matcher, pred0, pred1)
        pred["image0_orig"] = image0
        pred["image1_orig"] = image1

    pred = filter_matches(
        pred,
        ransac_method=ransac_method,
        ransac_reproj_threshold=ransac_reproj_threshold,
        ransac_confidence=ransac_confidence,
        ransac_max_iter=ransac_max_iter,
    )
    return pred


def run_ransac(state_cache, choice_geometry_type, ransac_method,
               ransac_reproj_threshold, ransac_confidence, ransac_max_iter,
               output_dir=None):
    """Re-run RANSAC on cached matches (reference parity:
    imcui/ui/utils.py:722-803)."""
    if not state_cache:
        logger.info("Error: re-run failed, no state cached!")
        return None
    pred = filter_matches(
        state_cache,
        ransac_method=ransac_method,
        ransac_reproj_threshold=ransac_reproj_threshold,
        ransac_confidence=ransac_confidence,
        ransac_max_iter=ransac_max_iter,
    )
    if output_dir is not None:
        output = Path(output_dir) / "output.pkl"
        output.parent.mkdir(exist_ok=True, parents=True)
        with open(output, "wb") as f:
            pickle.dump(pred, f)
    return pred
