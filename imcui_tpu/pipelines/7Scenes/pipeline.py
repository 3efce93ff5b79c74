"""7-Scenes localization recipe (reference contract:
imcui/hloc/pipelines/7Scenes/pipeline.py — per-scene triangulation on the
GT SfM models followed by query localization)."""

import argparse
from pathlib import Path

from ... import logger
from ...pipeline import (extract_features, localize_sfm, match_features,
                         pairs_from_covisibility, pairs_from_retrieval,
                         triangulation)

SCENES = ["chess", "fire", "heads", "office", "pumpkin", "redkitchen",
          "stairs"]


def run_scene(images, gt_dir, retrieval, outputs, results, num_covis,
              num_loc):
    outputs.mkdir(exist_ok=True, parents=True)
    ref_sfm = outputs / "sfm_superpoint+superglue"
    sfm_pairs = outputs / f"pairs-db-covis{num_covis}.txt"
    loc_pairs = outputs / f"pairs-query-netvlad{num_loc}.txt"

    feature_conf = extract_features.confs["superpoint_max"]
    matcher_conf = match_features.confs["superglue"]
    retrieval_conf = extract_features.confs["netvlad"]

    features = extract_features.main(feature_conf, images, outputs)
    pairs_from_covisibility.main(gt_dir, sfm_pairs, num_matched=num_covis)
    sfm_matches = match_features.main(
        matcher_conf, sfm_pairs, feature_conf["output"], outputs)
    triangulation.main(ref_sfm, gt_dir, images, sfm_pairs, features,
                       sfm_matches)

    global_descriptors = extract_features.main(retrieval_conf, images,
                                               outputs)
    pairs_from_retrieval.main(global_descriptors, loc_pairs, num_loc,
                              db_model=ref_sfm, query_prefix="seq")
    loc_matches = match_features.main(
        matcher_conf, loc_pairs, feature_conf["output"], outputs)
    localize_sfm.main(ref_sfm, gt_dir / "queries_with_intrinsics.txt",
                      loc_pairs, features, loc_matches, results)


def run(dataset=Path("datasets/7scenes"), outputs=Path("outputs/7scenes"),
        scenes=None, num_covis=30, num_loc=10):
    for scene in scenes or SCENES:
        logger.info(f"Working on scene {scene}.")
        run_scene(
            dataset / scene, dataset / scene / "sfm_gt",
            dataset / f"{scene}_retrieval.txt", outputs / scene,
            outputs / scene / f"results_netvlad{num_loc}.txt",
            num_covis, num_loc,
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=Path, default="datasets/7scenes")
    parser.add_argument("--outputs", type=Path, default="outputs/7scenes")
    parser.add_argument("--scenes", nargs="+", default=None)
    args = parser.parse_args()
    run(**vars(args))
