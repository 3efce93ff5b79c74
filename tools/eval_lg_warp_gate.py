"""Held-out warp-gate eval of trained LightGlue checkpoints.

Selects the shipping checkpoint for weights/lightglue_selftrained.npz:
runs the FULL serving path (ImageMatchingAPI: adapted SuperPoint +
candidate LightGlue) over the known-homography battery on the gate
photo — which is excluded from both training corpora (weights/README.md)
— and prints median recall / matches / corner error per candidate.

Usage: python tools/eval_lg_warp_gate.py runs/lg_homog_r5/lightglue_*.npz
"""

import json
import pathlib
import sys

sys.path.insert(0, "/root/repo")

import cv2  # noqa: E402

from imcui_tpu.api.core import ImageMatchingAPI  # noqa: E402
from imcui_tpu.eval.warp import evaluate_warp  # noqa: E402
from imcui_tpu.utils.image import read_image  # noqa: E402

IMG = "/root/reference/tests/data/02928139_3448003521.jpg"
SP = "/root/repo/weights/superpoint_adapted.npz"


def conf_for(lg_npz):
    return {
        "feature": {
            "output": "feats-superpoint",
            "model": {"name": "superpoint", "max_keypoints": 1024,
                      "keypoint_threshold": 5e-4,
                      "checkpoint_npz": SP},
            "preprocessing": {"grayscale": True, "resize_max": 480,
                              "dfactor": 8},
        },
        "matcher": {
            "output": "matches-lightglue",
            "model": {"name": "lightglue", "features": "superpoint",
                      "match_threshold": 0.1,
                      "checkpoint_npz": str(lg_npz)},
        },
        "dense": False,
        "standalone": False,
    }


def main():
    img = read_image(IMG)
    h, w = img.shape[:2]
    s = 480.0 / max(h, w)
    photo = cv2.resize(img, (int(w * s), int(h * s)))
    for npz in sys.argv[1:]:
        api = ImageMatchingAPI(conf=conf_for(npz))
        results, agg = evaluate_warp(api, photo)
        print(json.dumps({"ckpt": pathlib.Path(npz).name,
                          **{k: round(v, 4) for k, v in agg.items()}}),
              flush=True)


if __name__ == "__main__":
    main()
