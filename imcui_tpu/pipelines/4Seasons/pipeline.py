"""4Seasons relocalization recipe (reference contract:
imcui/hloc/pipelines/4Seasons/ — reference-map triangulation from the
provided GNSS/VIO poses, then sequence localization; the dataset-specific
undistortion/pose-format utilities are consumed from the dataset's own
tooling)."""

import argparse
from pathlib import Path

from ... import logger
from ...pipeline import (extract_features, localize_sfm, match_features,
                         pairs_from_poses, pairs_from_retrieval,
                         triangulation)


def run(dataset=Path("datasets/4seasons"),
        outputs=Path("outputs/4seasons"),
        reference_sequence="reference", query_sequence="training",
        num_covis=20, num_loc=10):
    ref_images = dataset / reference_sequence / "undistorted_images"
    query_images = dataset / query_sequence / "undistorted_images"
    ref_model = dataset / reference_sequence / "sfm_gt"
    outputs.mkdir(exist_ok=True, parents=True)

    ref_sfm = outputs / "sfm_superpoint+superglue"
    sfm_pairs = outputs / f"pairs-db-dist{num_covis}.txt"
    loc_pairs = outputs / f"pairs-query-netvlad{num_loc}.txt"
    results = outputs / f"4Seasons_{query_sequence}_results.txt"

    feature_conf = extract_features.confs["superpoint_max"]
    matcher_conf = match_features.confs["superglue"]
    retrieval_conf = extract_features.confs["netvlad"]

    pairs_from_poses.main(ref_model, sfm_pairs, num_matched=num_covis)
    features = extract_features.main(feature_conf, ref_images, outputs)
    sfm_matches = match_features.main(
        matcher_conf, sfm_pairs, feature_conf["output"], outputs)
    triangulation.main(ref_sfm, ref_model, ref_images, sfm_pairs,
                       features, sfm_matches)

    global_descriptors = extract_features.main(retrieval_conf,
                                               query_images, outputs)
    extract_features.main(retrieval_conf, ref_images, outputs)
    pairs_from_retrieval.main(global_descriptors, loc_pairs, num_loc,
                              db_model=ref_sfm)
    features = extract_features.main(feature_conf, query_images, outputs)
    loc_matches = match_features.main(
        matcher_conf, loc_pairs, feature_conf["output"], outputs)
    localize_sfm.main(
        ref_sfm, dataset / query_sequence / "queries_with_intrinsics.txt",
        loc_pairs, features, loc_matches, results)
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=Path,
                        default="datasets/4seasons")
    parser.add_argument("--outputs", type=Path,
                        default="outputs/4seasons")
    args = parser.parse_args()
    run(**vars(args))
