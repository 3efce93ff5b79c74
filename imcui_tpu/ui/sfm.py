"""SfM engine for the WebUI tab (reference contract:
imcui/ui/sfm.py:24-164 — same call(): copy uploads → retrieval →
pairs_from_retrieval → extract → match → reconstruction → export obj)."""

import shutil
import tempfile
from pathlib import Path

from .. import logger
from ..pipeline import (extract_features, match_features,
                        pairs_from_retrieval, reconstruction)


class SfmEngine:
    def __init__(self, cfg=None):
        self.cfg = cfg or {}
        if "outputs" in self.cfg and Path(self.cfg["outputs"]).exists():
            self.outputs = Path(self.cfg["outputs"])
        else:
            self.outputs = tempfile.mkdtemp()

    def call(
        self,
        key,
        images,
        camera_model="PINHOLE",
        camera_params=None,
        max_keypoints=4096,
        keypoint_threshold=0.005,
        match_threshold=0.2,
        ransac_threshold=8,
        ransac_confidence=0.9999,
        ransac_max_iter=10000,
        scene_graph="all",
        global_feature="netvlad",
        top_k=10,
        mapper_refine_focal_length=False,
        mapper_refine_principle_points=False,
        mapper_refine_extra_params=False,
    ):
        """Reference parity: imcui/ui/sfm.py:34-164."""
        outputs = Path(self.outputs)
        outputs.mkdir(parents=True, exist_ok=True)
        temp_images = Path(tempfile.mkdtemp())
        # copy images
        for image in images:
            shutil.copy(str(image), str(temp_images))

        sfm_dir = outputs / "sfm"
        feature_dir = outputs / "features"
        feature_dir.mkdir(parents=True, exist_ok=True)
        sfm_pairs = outputs / "pairs-sfm.txt"

        feature_conf = {
            "output": "feats-superpoint",
            "model": {
                "name": "superpoint",
                "max_keypoints": max_keypoints,
                "keypoint_threshold": keypoint_threshold,
            },
            "preprocessing": {"grayscale": True, "resize_max": 1600,
                              "dfactor": 8},
        }
        match_conf = {
            "output": "matches-NN-mutual",
            "model": {"name": "nearest_neighbor", "do_mutual_check": True},
        }

        if scene_graph == "all" or global_feature is None:
            from ..pipeline import pairs_from_exhaustive

            feature_path = extract_features.main(
                feature_conf, temp_images, feature_dir
            )
            pairs_from_exhaustive.main(sfm_pairs, features=feature_path)
        else:
            retrieval_conf = extract_features.confs[global_feature]
            retrieval_path = extract_features.main(
                retrieval_conf, temp_images, feature_dir
            )
            pairs_from_retrieval.main(
                retrieval_path, sfm_pairs, num_matched=top_k
            )
            feature_path = extract_features.main(
                feature_conf, temp_images, feature_dir
            )

        match_path = match_features.main(
            match_conf, sfm_pairs, features=feature_path,
            matches=feature_dir / "matches.h5",
        )

        mapper_options = {
            "ba_refine_focal_length": mapper_refine_focal_length,
            "ba_refine_principal_point": mapper_refine_principle_points,
            "ba_refine_extra_params": mapper_refine_extra_params,
        }
        try:
            model = reconstruction.main(
                sfm_dir, temp_images, sfm_pairs, feature_path, match_path,
                mapper_options=mapper_options,
            )
        except ImportError as e:
            logger.warning(str(e))
            return {
                "sfm_dir": str(sfm_dir),
                "database": str(sfm_dir / "database.db"),
                "status": "database-only (mapper backend unavailable)",
            }

        # export a point cloud .obj for the Model3D widget
        if model is not None:
            obj_path = sfm_dir / "points3D.obj"
            try:
                with open(obj_path, "w") as f:
                    for pid, p in model.points3D.items():
                        x, y, z = p.xyz
                        r, g, b = p.color / 255.0
                        f.write(f"v {x} {y} {z} {r} {g} {b}\n")
            except Exception as e:  # pragma: no cover
                logger.warning(f"obj export failed: {e}")
            return {
                "sfm_dir": str(sfm_dir),
                "obj": str(obj_path),
                "status": "ok",
            }
        return {"sfm_dir": str(sfm_dir), "status": "failed"}

    def call_empty(self, *args, **kwargs):
        """Placeholder used while the tab is under development (reference:
        imcui/ui/app_class.py:801-802)."""
        logger.info("SfM engine invoked without inputs.")
        return None
