"""Held-out warp-gate eval of the locally trained LoFTR (r5)."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, cv2
from imcui_tpu.api.core import ImageMatchingAPI
from imcui_tpu.eval.warp import evaluate_warp
from imcui_tpu.utils.image import read_image

CKPT = sys.argv[1] if len(sys.argv) > 1 else "runs/loftr_homog_r5/loftr_final.npz"
PREC = sys.argv[2] if len(sys.argv) > 2 else "bf16"
img = read_image("/root/reference/tests/data/02928139_3448003521.jpg")
h, w = img.shape[:2]
s = 480.0 / max(h, w)
img = cv2.resize(img, (int(w * s), int(h * s)))

conf = {
    "matcher": {"output": "matches-loftr",
                "model": {"name": "loftr", "max_keypoints": 1024,
                          "match_threshold": 0.2, "precision": PREC,
                          "checkpoint_npz": CKPT},
                "preprocessing": {"grayscale": True, "resize_max": 320,
                                  "dfactor": 8}},
    "dense": True, "standalone": True,
}
api = ImageMatchingAPI(conf=conf)
print("meta:", api.matcher.meta)
results, agg = evaluate_warp(api, img)
print("per-warp:", [(r["n_matches"], round(r["recall"], 3),
                     round(r["h_corner_err"], 2)) for r in results])
print("agg:", {k: round(v, 4) for k, v in agg.items()})
