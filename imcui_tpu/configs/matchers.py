"""Matcher configs (reference contract: imcui/hloc/configs/matchers.py:8-890
— same schema and key names).

Notes on TPU-specific keys:
- lightglue: the reference's runtime-adaptive ``depth_confidence`` /
  ``width_confidence`` fight XLA's static compilation; they are accepted
  for API parity, and ``n_layers`` presets give the static-depth analog.
"""

confs = {
    # ------------------------------------------------------------------
    # sparse matchers
    # ------------------------------------------------------------------
    "superglue": {
        "output": "matches-superglue",
        "model": {
            "name": "superglue",
            "weights": "outdoor",
            "sinkhorn_iterations": 50,
            "match_threshold": 0.2,
        },
        "preprocessing": {
            "grayscale": True,
            "resize_max": 1024,
            "dfactor": 8,
            "force_resize": False,
        },
    },
    "superglue-fast": {
        "output": "matches-superglue-it5",
        "model": {
            "name": "superglue",
            "weights": "outdoor",
            "sinkhorn_iterations": 5,
            "match_threshold": 0.2,
        },
    },
    "superpoint-lightglue": {
        "output": "matches-lightglue",
        "model": {
            "name": "lightglue",
            "match_threshold": 0.2,
            "width_confidence": 0.99,
            "depth_confidence": 0.95,
            "features": "superpoint",
            "model_name": "superpoint_lightglue.pth",
        },
        "preprocessing": {
            "grayscale": True,
            "resize_max": 1024,
            "dfactor": 8,
            "force_resize": False,
        },
    },
    "disk-lightglue": {
        "output": "matches-disk-lightglue",
        "model": {
            "name": "lightglue",
            "match_threshold": 0.2,
            "width_confidence": 0.99,
            "depth_confidence": 0.95,
            "features": "disk",
            "model_name": "disk_lightglue.pth",
        },
        "preprocessing": {
            "grayscale": True,
            "resize_max": 1024,
            "dfactor": 8,
            "force_resize": False,
        },
    },
    "aliked-lightglue": {
        "output": "matches-aliked-lightglue",
        "model": {
            "name": "lightglue",
            "match_threshold": 0.2,
            "width_confidence": 0.99,
            "depth_confidence": 0.95,
            "features": "aliked",
            "model_name": "aliked_lightglue.pth",
        },
        "preprocessing": {
            "grayscale": True,
            "resize_max": 1024,
            "dfactor": 8,
            "force_resize": False,
        },
    },
    "sift-lightglue": {
        "output": "matches-sift-lightglue",
        "model": {
            "name": "lightglue",
            "match_threshold": 0.2,
            "width_confidence": 0.99,
            "depth_confidence": 0.95,
            "features": "sift",
            "add_scale_ori": True,
            "model_name": "sift_lightglue.pth",
        },
        "preprocessing": {
            "grayscale": True,
            "resize_max": 1024,
            "dfactor": 8,
            "force_resize": False,
        },
    },
    "sgmnet": {
        "output": "matches-sgmnet",
        "model": {
            "name": "sgmnet",
            "seed_top_k": 128,
            "seed_radius_coe": 0.01,
            "net_channels": 128,
            "layer_num": 4,
            "sinkhorn_iterations": 30,
            "match_threshold": 0.2,
        },
        "preprocessing": {
            "grayscale": True,
            "resize_max": 1024,
            "dfactor": 8,
            "force_resize": False,
        },
    },
    "NN-superpoint": {
        "output": "matches-NN-mutual-dist.7",
        "model": {
            "name": "nearest_neighbor",
            "do_mutual_check": True,
            "distance_threshold": 0.7,
        },
    },
    "NN-ratio": {
        "output": "matches-NN-mutual-ratio.8",
        "model": {
            "name": "nearest_neighbor",
            "do_mutual_check": True,
            "ratio_threshold": 0.8,
        },
    },
    "NN-mutual": {
        "output": "matches-NN-mutual",
        "model": {
            "name": "nearest_neighbor",
            "do_mutual_check": True,
        },
    },
    "Dual-Softmax": {
        "output": "matches-Dual-Softmax",
        "model": {
            "name": "dual_softmax",
            "match_threshold": 0.2,
            "inv_temperature": 20,
        },
    },
    "adalam": {
        "output": "matches-adalam",
        "model": {
            "name": "adalam",
        },
    },
    # ------------------------------------------------------------------
    # dense (standalone) matchers
    # ------------------------------------------------------------------
    "loftr": {
        "output": "matches-loftr",
        "model": {
            "name": "loftr",
            "weights": "outdoor",
            "max_keypoints": 2000,
            "match_threshold": 0.2,
        },
        "preprocessing": {
            "grayscale": True,
            "resize_max": 1024,
            "dfactor": 8,
            "width": 640,
            "height": 480,
            "force_resize": True,
        },
        "max_error": 1,
        "cell_size": 1,
    },
    "eloftr": {
        "output": "matches-eloftr",
        "model": {
            "name": "eloftr",
            "weights": "weights/eloftr_outdoor.ckpt",
            "max_keypoints": 2000,
            "match_threshold": 0.2,
        },
        "preprocessing": {
            "grayscale": True,
            "resize_max": 1024,
            "dfactor": 32,
            "width": 640,
            "height": 480,
            "force_resize": True,
        },
        "max_error": 1,
        "cell_size": 1,
    },
    "roma": {
        "output": "matches-roma",
        "model": {
            "name": "roma",
            "model_name": "roma_outdoor.pth",
            "max_keypoints": 2000,
            "match_threshold": 0.2,
        },
        "preprocessing": {
            "grayscale": False,
            "force_resize": True,
            "resize_max": 1024,
            "width": 320,
            "height": 240,
            "dfactor": 8,
        },
        "max_error": 1,
        "cell_size": 1,
    },
    "dkm": {
        "output": "matches-dkm",
        "model": {
            "name": "dkm",
            "model_name": "DKMv3_outdoor.pth",
            "max_keypoints": 2000,
            "match_threshold": 0.2,
        },
        "preprocessing": {
            "grayscale": False,
            "force_resize": True,
            "resize_max": 1024,
            "width": 80,
            "height": 60,
            "dfactor": 8,
        },
        "max_error": 1,
        "cell_size": 1,
    },
    "duster": {
        "output": "matches-duster",
        "model": {
            "name": "duster",
            "weights": "duster_vit_large",
            "max_keypoints": 2000,
            "match_threshold": 0.2,
        },
        "preprocessing": {
            "grayscale": False,
            "resize_max": 512,
            "dfactor": 16,
        },
        "max_error": 1,
        "cell_size": 1,
    },
    "mast3r": {
        "output": "matches-mast3r",
        "model": {
            "name": "mast3r",
            "weights": "mast3r_vit_large",
            "max_keypoints": 2000,
            "match_threshold": 0.2,
        },
        "preprocessing": {
            "grayscale": False,
            "resize_max": 512,
            "dfactor": 16,
        },
        "max_error": 1,
        "cell_size": 1,
    },
    "xfeat-lightglue": {
        "output": "matches-xfeat-lightglue",
        "model": {
            "name": "xfeat_lightglue",
            "max_keypoints": 4096,
            "match_threshold": 0.1,
        },
        "preprocessing": {
            "grayscale": False,
            "force_resize": False,
            "resize_max": 1024,
            "dfactor": 8,
        },
        "max_error": 1,
        "cell_size": 1,
    },
    # ------------------------------------------------------------------
    # checkpoint variants of implemented architectures (the reference
    # treats these the same way: one wrapper, different weights —
    # e.g. minima_lightglue/gim_dkm/dad_roma in configs/matchers.py)
    # ------------------------------------------------------------------
    "minima_lightglue": {
        "output": "matches-minima_lightglue",
        "model": {
            "name": "lightglue",
            "match_threshold": 0.2,
            "width_confidence": 0.99,
            "depth_confidence": 0.95,
            "features": "superpoint",
            "model_name": "minima_lightglue.pth",
        },
        "preprocessing": {
            "grayscale": True,
            "resize_max": 1024,
            "dfactor": 8,
            "force_resize": False,
        },
    },
    "minima_loftr": {
        "output": "matches-minima_loftr",
        "model": {
            "name": "loftr",
            "weights": "minima_loftr.ckpt",
            "max_keypoints": 2000,
            "match_threshold": 0.2,
        },
        "preprocessing": {
            "grayscale": True,
            "resize_max": 1024,
            "dfactor": 8,
            "force_resize": False,
        },
        "max_error": 1,
        "cell_size": 1,
    },
    "minima_roma": {
        "output": "matches-minima_roma",
        "model": {
            "name": "roma",
            "model_name": "minima_roma.pth",
            "max_keypoints": 2000,
            "match_threshold": 0.2,
        },
        "preprocessing": {
            "grayscale": False,
            "force_resize": True,
            "resize_max": 1024,
            "width": 320,
            "height": 240,
            "dfactor": 8,
        },
        "max_error": 1,
        "cell_size": 1,
    },
    "gim(dkm)": {
        "output": "matches-gim",
        "model": {
            "name": "dkm",
            "model_name": "gim_dkm_100h.ckpt",
            "max_keypoints": 2000,
            "match_threshold": 0.2,
        },
        "preprocessing": {
            "grayscale": False,
            "force_resize": True,
            "resize_max": 1024,
            "width": 320,
            "height": 240,
            "dfactor": 8,
        },
        "max_error": 1,
        "cell_size": 1,
    },
    "lisrd": {
        "output": "matches-lisrd",
        "model": {
            "name": "lisrd",
            "model_name": "lisrd_aachen",
            "max_keypoints": 2048,
            "detector": "superpoint",
        },
        "preprocessing": {
            "grayscale": False,
            "resize_max": 1024,
            "dfactor": 8,
            "force_resize": False,
        },
        "max_error": 1,
        "cell_size": 1,
    },
    "gluestick": {
        "output": "matches-gluestick",
        "model": {
            "name": "gluestick",
            "max_keypoints": 1000,
            "max_lines": 300,
        },
        "preprocessing": {
            "grayscale": True,
            "resize_max": 1024,
            "dfactor": 8,
            "force_resize": False,
        },
        "max_error": 1,
        "cell_size": 1,
    },
    "xfeat_dense": {
        "output": "matches-xfeat_dense",
        "model": {
            "name": "xfeat_dense",
            "max_keypoints": 8000,
        },
        "preprocessing": {
            "grayscale": False,
            "force_resize": False,
            "resize_max": 1024,
            "width": 640,
            "height": 480,
            "dfactor": 8,
        },
        "max_error": 1,
        "cell_size": 1,
    },
}
