"""Extended-CMU-Seasons localization recipe (reference contract:
imcui/hloc/pipelines/CMU/pipeline.py:1-133 — per-slice triangulation on
the SIFT models + query localization; the two-camera intrinsics file
generates the query list)."""

import argparse
from pathlib import Path

from ... import logger
from ...pipeline import (extract_features, localize_sfm, match_features,
                         pairs_from_covisibility, pairs_from_retrieval,
                         triangulation)

TEST_SLICES = [2, 3, 4, 5, 6, 13, 14, 15, 16, 17, 18, 19, 20, 21]


def generate_query_list(dataset, path, slice_):
    """Attach the per-camera intrinsics to each test image (reference
    parity: CMU/pipeline.py:17-33)."""
    cameras = {}
    with open(dataset / "intrinsics.txt", "r") as f:
        for line in f.readlines():
            if line[0] == "#" or line == "\n":
                continue
            data = line.split()
            cameras[data[0]] = data[1:]
    assert len(cameras) == 2

    queries = dataset / f"{slice_}/test-images-{slice_}.txt"
    with open(queries, "r") as f:
        queries = [q.rstrip("\n") for q in f.readlines()]

    out = [[q] + cameras[q.split("_")[2]] for q in queries]
    with open(path, "w") as f:
        f.write("\n".join(map(" ".join, out)))


def run_slice(slice_, root, outputs, num_covis, num_loc):
    dataset = root / slice_
    ref_images = dataset / "database"
    query_images = dataset / "query"
    sift_sfm = dataset / "sparse"

    outputs = outputs / slice_
    outputs.mkdir(exist_ok=True, parents=True)
    query_list = dataset / "queries_with_intrinsics.txt"
    sfm_pairs = outputs / f"pairs-db-covis{num_covis}.txt"
    loc_pairs = outputs / f"pairs-query-netvlad{num_loc}.txt"
    ref_sfm = outputs / "sfm_superpoint+superglue"
    results = outputs / f"CMU_hloc_superpoint+superglue_netvlad{num_loc}.txt"

    retrieval_conf = extract_features.confs["netvlad"]
    feature_conf = extract_features.confs["superpoint_aachen"]
    matcher_conf = match_features.confs["superglue"]

    pairs_from_covisibility.main(sift_sfm, sfm_pairs, num_matched=num_covis)
    features = extract_features.main(feature_conf, ref_images, outputs,
                                     as_half=True)
    sfm_matches = match_features.main(
        matcher_conf, sfm_pairs, feature_conf["output"], outputs)
    triangulation.main(ref_sfm, sift_sfm, ref_images, sfm_pairs, features,
                       sfm_matches)

    generate_query_list(root, query_list, slice_)
    extract_features.main(retrieval_conf, ref_images, outputs)
    global_descriptors = extract_features.main(retrieval_conf,
                                               query_images, outputs)
    pairs_from_retrieval.main(global_descriptors, loc_pairs, num_loc,
                              query_list=query_list, db_model=ref_sfm)
    features = extract_features.main(feature_conf, query_images, outputs,
                                     as_half=True)
    loc_matches = match_features.main(
        matcher_conf, loc_pairs, feature_conf["output"], outputs)
    localize_sfm.main(ref_sfm, query_list, loc_pairs, features,
                      loc_matches, results)


def run(dataset=Path("datasets/cmu_extended"),
        outputs=Path("outputs/cmu_extended"), slices=None,
        num_covis=20, num_loc=10):
    for s in slices or TEST_SLICES:
        slice_ = f"slice{s}"
        logger.info(f"Working on {slice_}.")
        run_slice(slice_, dataset, outputs, num_covis, num_loc)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=Path,
                        default="datasets/cmu_extended")
    parser.add_argument("--outputs", type=Path,
                        default="outputs/cmu_extended")
    parser.add_argument("--slices", nargs="+", type=int, default=None)
    args = parser.parse_args()
    run(**vars(args))
