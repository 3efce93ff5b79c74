"""Held-out evaluation of a locally trained (homographic-adaptation)
SuperPoint: the offline accuracy-gate protocol (eval/warp.py) on the
gate photo, which is NEVER in the training corpus (the corpus is
/root/reference/imcui/datasets; the gate photo lives in tests/data).

Usage: python tools/eval_sp_adapted.py [npz_path] [matcher]
Prints one JSON line per pipeline with the gate's aggregate metrics.
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import cv2  # noqa: E402
import numpy as np  # noqa: E402

from imcui_tpu.api.core import ImageMatchingAPI  # noqa: E402
from imcui_tpu.eval.warp import evaluate_warp  # noqa: E402
from imcui_tpu.utils.image import read_image  # noqa: E402

IMG = "/root/reference/tests/data/02928139_3448003521.jpg"


def sp_conf(npz, matcher="nearest_neighbor", keypoint_threshold=5e-4):
    return {
        "feature": {
            "output": "feats-superpoint-trained",
            "model": {"name": "superpoint", "max_keypoints": 1024,
                      "keypoint_threshold": keypoint_threshold,
                      "checkpoint_npz": str(npz)},
            "preprocessing": {"grayscale": True, "resize_max": 480,
                              "dfactor": 8},
        },
        "matcher": {"output": "matches-NN-mutual",
                    "model": {"name": matcher, "do_mutual_check": True}},
        "dense": False,
        "standalone": False,
    }


def main():
    npz = sys.argv[1] if len(sys.argv) > 1 else \
        "runs/sp_adapted/superpoint_adapted.npz"
    matcher = sys.argv[2] if len(sys.argv) > 2 else "nearest_neighbor"

    img = read_image(IMG)
    h, w = img.shape[:2]
    s = 480.0 / max(h, w)
    img = cv2.resize(img, (int(w * s), int(h * s)))

    api = ImageMatchingAPI(conf=sp_conf(npz, matcher))
    assert api.extractor.meta.get("pretrained"), "npz did not load"
    results, agg = evaluate_warp(api, img)
    print(json.dumps({"pipeline": f"superpoint(adapted)+{matcher}",
                      "npz": npz, **agg,
                      "per_warp": [r["n_matches"] for r in results],
                      "recalls": [round(r["recall"], 3)
                                  for r in results]}))


if __name__ == "__main__":
    main()
