"""Programmatic matching API (reference contract: imcui/api/core.py:19-309
— same conf schema, same output keys, same extract/forward/visualize
methods).

TPU-first: models are constructed once (compiled executables cached per
static config) and the default geometric verification is the on-device
TPU LO-RANSAC instead of the reference's poselib CPU estimator."""

from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from .. import logger
from ..pipeline import extract_features, match_dense, match_features
from ..ui.utils import (DEFAULT_RANSAC_METHOD, filter_matches, get_model,
                        get_feature_model)


class ImageMatchingAPI:
    default_conf = {
        "ransac": {
            "enable": True,
            "estimator": "tpu",
            "geometry": "homography",
            "method": DEFAULT_RANSAC_METHOD,
            "reproj_threshold": 3,
            "confidence": 0.9999,
            "max_iter": 10000,
        },
    }

    def __init__(self, conf: dict = None, device: str = "tpu",
                 detect_threshold: float = 0.015,
                 max_keypoints: int = 1024,
                 match_threshold: float = 0.2) -> None:
        self.device = device
        self.conf = {**self.default_conf, **(conf or {})}
        self._update_config(detect_threshold, max_keypoints, match_threshold)
        self._init_models()
        self.pred = None

    def parse_match_config(self, conf):
        """Reference parity: imcui/api/core.py:64-77."""
        if conf["standalone"]:
            return {
                **conf,
                "matcher": match_dense.confs.get(
                    conf["matcher"]["model"]["name"]
                ),
                "standalone": True,
            }
        return {
            **conf,
            "feature": extract_features.confs.get(
                conf["feature"]["model"]["name"]
            ),
            "matcher": match_features.confs.get(
                conf["matcher"]["model"]["name"]
            ),
            "standalone": False,
        }

    def _update_config(self, detect_threshold=0.015, max_keypoints=1024,
                       match_threshold=0.2):
        self.standalone = self.conf["standalone"]
        if self.standalone:
            try:
                self.conf["matcher"]["model"]["match_threshold"] = \
                    match_threshold
            except TypeError as e:
                logger.error(e)
        else:
            self.conf["feature"]["model"]["max_keypoints"] = max_keypoints
            self.conf["feature"]["model"]["keypoint_threshold"] = \
                detect_threshold
            self.extract_conf = self.conf["feature"]
        self.match_conf = self.conf["matcher"]

    def _init_models(self):
        self.matcher = get_model(self.match_conf)
        self.extractor = None if self.standalone else \
            get_feature_model(self.conf["feature"])

    def _forward(self, img0, img1):
        if self.standalone:
            pred = match_dense.match_images(
                self.matcher, img0, img1,
                self.match_conf.get("preprocessing", {}),
            )
        else:
            pred0 = extract_features.extract(
                self.extractor, img0, self.extract_conf["preprocessing"]
            )
            pred1 = extract_features.extract(
                self.extractor, img1, self.extract_conf["preprocessing"]
            )
            pred = match_features.match_images(self.matcher, pred0, pred1)
            pred["image0_orig"] = img0
            pred["image1_orig"] = img1
        return pred

    def extract(self, img0: np.ndarray, **kwargs) -> Dict[str, np.ndarray]:
        """Single-image extraction (reference parity:
        imcui/api/core.py:142-172 — incl. the binarize option)."""
        self.extractor.conf["max_keypoints"] = kwargs.get("max_keypoints", 512)
        self.extractor.conf["keypoint_threshold"] = kwargs.get(
            "keypoint_threshold", 0.0
        )
        pred = extract_features.extract(
            self.extractor, img0, self.extract_conf["preprocessing"]
        )
        # trim padding + to numpy (host boundary)
        trimmed = extract_features.trim_valid(pred)
        for k in ("image", "original_size", "size"):
            trimmed[k] = np.asarray(pred[k])
        s0 = trimmed["original_size"] / trimmed["size"]
        trimmed["keypoints_orig"] = (
            match_features.scale_keypoints(trimmed["keypoints"] + 0.5, s0)
            - 0.5
        )
        if kwargs.get("binarize", False):
            assert "descriptors" in trimmed
            trimmed["descriptors"] = (trimmed["descriptors"] > 0).astype(
                np.uint8
            )
            trimmed["descriptors"] = trimmed["descriptors"].T  # N x DIM
        return trimmed

    def forward(self, img0: np.ndarray, img1: np.ndarray) -> Dict[str, Any]:
        """Match a pair; output keys documented in the reference
        (imcui/api/core.py:190-202): image*_orig, keypoints*_orig,
        mkeypoints*_orig (raw), mmkeypoints*_orig (RANSAC inliers),
        mconf, mmconf."""
        assert isinstance(img0, np.ndarray)
        assert isinstance(img1, np.ndarray)
        self.pred = self._forward(img0, img1)
        if self.conf["ransac"]["enable"]:
            self.pred = self._geometry_check(self.pred)
        return self.pred

    __call__ = forward

    def _geometry_check(self, pred):
        return filter_matches(
            pred,
            ransac_method=self.conf["ransac"]["method"],
            ransac_reproj_threshold=self.conf["ransac"]["reproj_threshold"],
            ransac_confidence=self.conf["ransac"]["confidence"],
            ransac_max_iter=self.conf["ransac"]["max_iter"],
        )

    def visualize(self, log_path: Optional[Path] = None) -> None:
        """Write keypoint/raw/RANSAC match PNGs (reference parity:
        imcui/api/core.py:237-309)."""
        import cv2

        from ..ui.viz import display_keypoints, display_matches

        if self.conf["standalone"]:
            postfix = str(self.conf["matcher"]["model"]["name"])
        else:
            postfix = "{}_{}".format(
                str(self.conf["feature"]["model"]["name"]),
                str(self.conf["matcher"]["model"]["name"]),
            )
        pred = self.pred
        output_keypoints = display_keypoints(pred)
        output_matches_raw, _ = display_matches(pred, tag="KPTS_RAW")
        output_matches_ransac, _ = display_matches(pred, tag="KPTS_RANSAC")
        if log_path is not None:
            log_path = Path(log_path)
            log_path.mkdir(exist_ok=True, parents=True)
            cv2.imwrite(
                str(log_path / f"img_keypoints_{postfix}.png"),
                output_keypoints[:, :, ::-1].copy(),
            )
            cv2.imwrite(
                str(log_path / f"img_matches_raw_{postfix}.png"),
                output_matches_raw[:, :, ::-1].copy(),
            )
            cv2.imwrite(
                str(log_path / f"img_matches_ransac_{postfix}.png"),
                output_matches_ransac[:, :, ::-1].copy(),
            )
