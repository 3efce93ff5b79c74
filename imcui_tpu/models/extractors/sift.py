"""SIFT extractor (reference contract: imcui/hloc/extractors/sift.py:81-216
— OpenCV backend, RootSIFT option, returns scales + oris for
sift-lightglue; the pycolmap backend is gated).

Host-side by design: SIFT's DoG pyramid is a classic CPU algorithm and the
reference itself runs it through OpenCV's C++ (extractors/sift.py:120-127).
Outputs are padded to ``max_keypoints`` with a validity mask to match the
framework's fixed-shape conventions.
"""

import cv2
import numpy as np

from ...utils.base_model import BaseModel


def run_opencv_sift(features, image):
    """Detect + describe with OpenCV, returning keypoints, scales, angles,
    responses, descriptors (reference parity: extractors/sift.py:20-52)."""
    detections, descriptors = features.detectAndCompute(image, None)
    points = np.array([k.pt for k in detections], np.float32)
    scales = np.array([k.size for k in detections], np.float32)
    angles = np.deg2rad(
        np.array([k.angle for k in detections], np.float32)
    )
    responses = np.array([k.response for k in detections], np.float32)
    if descriptors is None:
        descriptors = np.zeros((0, 128), np.float32)
    return points, scales, angles, responses, descriptors.astype(np.float32)


class SIFT(BaseModel):
    default_conf = {
        "rootsift": True,
        "nms_radius": 0,  # None disables it
        "max_keypoints": 4096,
        "backend": "opencv",  # pycolmap backends are gated
        "detection_threshold": 0.0066667,
        "edge_threshold": 10,
        "first_octave": -1,
        "num_octaves": 4,
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        if conf["backend"] != "opencv":
            try:
                import pycolmap  # noqa: F401
            except ImportError:
                conf["backend"] = "opencv"
        self.sift = cv2.SIFT_create(
            contrastThreshold=conf["detection_threshold"],
            nfeatures=conf["max_keypoints"],
            edgeThreshold=conf["edge_threshold"],
            nOctaveLayers=3,
        )
        self.meta = {"pretrained": True}  # handcrafted

    def _forward(self, data):
        image = np.asarray(data["image"])
        b = image.shape[0]
        n = self.conf["max_keypoints"]
        out = {
            "keypoints": np.zeros((b, n, 2), np.float32),
            "scores": np.zeros((b, n), np.float32),
            "scales": np.zeros((b, n), np.float32),
            "oris": np.zeros((b, n), np.float32),
            "descriptors": np.zeros((b, 128, n), np.float32),
            "mask": np.zeros((b, n), bool),
        }
        for i in range(b):
            img = image[i]
            if img.ndim == 3:  # (C, H, W)
                img = img[0] if img.shape[0] == 1 else img.mean(0)
            img8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
            pts, scales, angles, responses, desc = run_opencv_sift(
                self.sift, img8
            )
            if len(pts) == 0:
                continue
            order = np.argsort(-responses)[:n]
            pts, scales, angles = pts[order], scales[order], angles[order]
            responses, desc = responses[order], desc[order]
            if self.conf["rootsift"]:
                # L1-normalise then sqrt (RootSIFT)
                desc = desc / np.maximum(
                    np.linalg.norm(desc, ord=1, axis=-1, keepdims=True),
                    1e-8,
                )
                desc = np.sqrt(desc)
            else:
                desc = desc / np.maximum(
                    np.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
                )
            m = len(pts)
            out["keypoints"][i, :m] = pts
            out["scores"][i, :m] = responses
            out["scales"][i, :m] = scales
            out["oris"][i, :m] = angles
            out["descriptors"][i, :, :m] = desc.T
            out["mask"][i, :m] = True
        return out
