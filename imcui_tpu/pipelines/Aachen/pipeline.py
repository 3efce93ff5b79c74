"""Aachen Day-Night localization recipe (reference contract:
imcui/hloc/pipelines/Aachen/pipeline.py:17-45 — the same end-to-end
composition of retrieval → SfM triangulation → query localization).
"""

import argparse
from pathlib import Path

from ... import logger
from ...pipeline import (colmap_from_nvm, extract_features, localize_sfm,
                         match_features, pairs_from_covisibility,
                         pairs_from_retrieval, triangulation)


def run(dataset=Path("datasets/aachen"), outputs=Path("outputs/aachen"),
        num_covis=20, num_loc=50):
    images = dataset / "images/images_upright/"
    sift_sfm = outputs / "sfm_sift"
    reference_sfm = outputs / "sfm_superpoint+superglue"
    sfm_pairs = outputs / f"pairs-db-covis{num_covis}.txt"
    loc_pairs = outputs / f"pairs-query-netvlad{num_loc}.txt"
    results = (
        outputs / f"Aachen_hloc_superpoint+superglue_netvlad{num_loc}.txt"
    )
    outputs.mkdir(exist_ok=True, parents=True)

    retrieval_conf = extract_features.confs["netvlad"]
    feature_conf = extract_features.confs["superpoint_aachen"]
    matcher_conf = match_features.confs["superglue"]

    logger.info("Converting the SIFT model from NVM...")
    colmap_from_nvm.main(
        dataset / "3D-models/aachen_cvpr2018_db.nvm",
        dataset / "3D-models/database_intrinsics.txt",
        dataset / "aachen.db",
        sift_sfm,
    )
    pairs_from_covisibility.main(sift_sfm, sfm_pairs, num_matched=num_covis)

    features = extract_features.main(feature_conf, images, outputs)
    sfm_matches = match_features.main(
        matcher_conf, sfm_pairs, feature_conf["output"], outputs
    )
    triangulation.main(
        reference_sfm, sift_sfm, images, sfm_pairs, features, sfm_matches
    )

    global_descriptors = extract_features.main(retrieval_conf, images,
                                               outputs)
    pairs_from_retrieval.main(
        global_descriptors, loc_pairs, num_loc,
        query_prefix="query", db_model=reference_sfm,
    )
    loc_matches = match_features.main(
        matcher_conf, loc_pairs, feature_conf["output"], outputs
    )

    localize_sfm.main(
        reference_sfm,
        dataset / "queries/*_time_queries_with_intrinsics.txt",
        loc_pairs, features, loc_matches, results,
        covisibility_clustering=False,
    )
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=Path,
                        default="datasets/aachen")
    parser.add_argument("--outputs", type=Path, default="outputs/aachen")
    parser.add_argument("--num_covis", type=int, default=20)
    parser.add_argument("--num_loc", type=int, default=50)
    args = parser.parse_args()
    run(**vars(args))
