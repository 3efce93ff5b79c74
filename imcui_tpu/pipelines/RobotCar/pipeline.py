"""RobotCar-Seasons localization recipe (reference contract:
imcui/hloc/pipelines/RobotCar/pipeline.py — NVM→COLMAP conversion,
triangulation, per-condition query localization over the three cameras)."""

import argparse
import glob
from pathlib import Path

from ... import logger
from ...pipeline import (colmap_from_nvm, extract_features, localize_sfm,
                         match_features, pairs_from_covisibility,
                         pairs_from_retrieval, triangulation)

CONDITIONS = [
    "dawn", "dusk", "night", "night-rain", "overcast-summer",
    "overcast-winter", "rain", "snow", "sun",
]


def generate_query_list(dataset, image_dir, path):
    """Reference parity: RobotCar/pipeline.py — per-camera intrinsics."""
    h, w = 1024, 1024
    intrinsics_filename = "intrinsics/{}_intrinsics.txt"
    cameras = {}
    for side in ["left", "right", "rear"]:
        with open(dataset / intrinsics_filename.format(side), "r") as f:
            fx = f.readline().split()[1]
            fy = f.readline().split()[1]
            cx = f.readline().split()[1]
            cy = f.readline().split()[1]
        cameras[side] = ["SIMPLE_RADIAL", w, h, fx, cx, cy, 0.0]

    queries = sorted(glob.glob(str(image_dir / "**/*.jpg"),
                               recursive=True))
    queries = [Path(q).relative_to(image_dir.parents[0]).as_posix()
               for q in queries]
    out = [[q] + cameras[Path(q).parent.name] for q in queries]
    with open(path, "w") as f:
        f.write("\n".join(map(" ".join, map(lambda x: map(str, x), out))))


def run(dataset=Path("datasets/robotcar"),
        outputs=Path("outputs/robotcar"), num_covis=20, num_loc=20):
    images = dataset / "images"
    sift_sfm = outputs / "sfm_sift"
    ref_sfm = outputs / "sfm_superpoint+superglue"
    sfm_pairs = outputs / f"pairs-db-covis{num_covis}.txt"
    loc_pairs = outputs / f"pairs-query-netvlad{num_loc}.txt"
    results = outputs / f"RobotCar_hloc_superpoint+superglue_netvlad{num_loc}.txt"
    outputs.mkdir(exist_ok=True, parents=True)

    retrieval_conf = extract_features.confs["netvlad"]
    feature_conf = extract_features.confs["superpoint_aachen"]
    matcher_conf = match_features.confs["superglue"]

    colmap_from_nvm.main(
        dataset / "3D-models/all-merged/all.nvm",
        dataset / "3D-models/overcast-reference.db",
        sift_sfm,
    )
    pairs_from_covisibility.main(sift_sfm, sfm_pairs,
                                 num_matched=num_covis)
    features = extract_features.main(feature_conf, images, outputs)
    sfm_matches = match_features.main(
        matcher_conf, sfm_pairs, feature_conf["output"], outputs)
    triangulation.main(ref_sfm, sift_sfm, images, sfm_pairs, features,
                       sfm_matches)

    query_list = outputs / "queries_with_intrinsics.txt"
    generate_query_list(dataset, images / "query", query_list)
    global_descriptors = extract_features.main(retrieval_conf, images,
                                               outputs)
    pairs_from_retrieval.main(global_descriptors, loc_pairs, num_loc,
                              query_list=query_list, db_model=ref_sfm)
    loc_matches = match_features.main(
        matcher_conf, loc_pairs, feature_conf["output"], outputs)
    localize_sfm.main(ref_sfm, query_list, loc_pairs, features,
                      loc_matches, results,
                      covisibility_clustering=True)
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=Path,
                        default="datasets/robotcar")
    parser.add_argument("--outputs", type=Path,
                        default="outputs/robotcar")
    args = parser.parse_args()
    run(**vars(args))
