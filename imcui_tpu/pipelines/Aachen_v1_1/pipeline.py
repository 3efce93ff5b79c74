"""Aachen v1.1 localization recipe (reference contract:
imcui/hloc/pipelines/Aachen_v1_1/pipeline.py — the v1.0 recipe with the
v1.1 reference model and query lists)."""

from pathlib import Path

from ..Aachen.pipeline import run as run_aachen


def run(dataset=Path("datasets/aachen_v1.1"),
        outputs=Path("outputs/aachen_v1.1"), num_covis=20, num_loc=50):
    return run_aachen(dataset=dataset, outputs=outputs,
                      num_covis=num_covis, num_loc=num_loc)


if __name__ == "__main__":
    run()
