"""Golden-output regression tests.

Committed .npz goldens pin the numerical behavior of the core models on
fixed seeded inputs (CPU backend, deterministic random-init weights).
Any refactor that changes numerics — intentionally or not — shows up here;
regenerate with:  python -m tests.test_goldens --regen
(or delete tests/goldens/ and run the suite once).

When converted pretrained checkpoints land, a second golden set pinned to
upstream-torch outputs becomes the cross-framework parity gate.
"""

from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "goldens"
ATOL = 5e-4  # bf16-touched paths wobble across XLA versions


def _superpoint_outputs():
    from imcui_tpu.models.extractors.superpoint import SuperPoint

    rng = np.random.RandomState(42)
    img = rng.rand(1, 1, 64, 96).astype(np.float32)
    model = SuperPoint({"max_keypoints": 64, "keypoint_threshold": 1e-6,
                        "precision": "fp32"})
    out = model({"image": img})
    return {k: np.asarray(v) for k, v in out.items()}


def _lightglue_outputs():
    from imcui_tpu.models.matchers.lightglue import LightGlue

    rng = np.random.RandomState(43)
    n = 48
    d0 = rng.randn(1, n, 256).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d1 = rng.randn(1, n, 256).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    model = LightGlue({"n_layers": 2, "match_threshold": 0.0})
    out = model({
        "keypoints0": rng.rand(1, n, 2).astype(np.float32) * 300,
        "keypoints1": rng.rand(1, n, 2).astype(np.float32) * 300,
        "descriptors0": d0, "descriptors1": d1,
        "size0": np.array([[320.0, 320.0]], np.float32),
        "size1": np.array([[320.0, 320.0]], np.float32),
    })
    return {k: np.asarray(v) for k, v in out.items()}


def _superglue_outputs():
    from imcui_tpu.models.matchers.superglue import SuperGlue

    rng = np.random.RandomState(44)
    n = 48
    d0 = rng.randn(1, n, 256).astype(np.float32)
    model = SuperGlue({"gnn_layers": 4, "sinkhorn_iterations": 20,
                       "match_threshold": 0.0})
    out = model({
        "keypoints0": rng.rand(1, n, 2).astype(np.float32) * 300,
        "keypoints1": rng.rand(1, n, 2).astype(np.float32) * 300,
        "descriptors0": d0, "descriptors1": d0.copy(),
        "scores0": rng.rand(1, n).astype(np.float32),
        "scores1": rng.rand(1, n).astype(np.float32),
        "size0": np.array([[320.0, 320.0]], np.float32),
        "size1": np.array([[320.0, 320.0]], np.float32),
    })
    return {k: np.asarray(v) for k, v in out.items()}


def _loftr_outputs():
    from imcui_tpu.models.matchers.loftr import LoFTR

    rng = np.random.RandomState(45)
    model = LoFTR({"max_keypoints": 32, "match_threshold": 0.0,
                   "precision": "fp32"})
    out = model({
        "image0": rng.rand(1, 1, 64, 64).astype(np.float32),
        "image1": rng.rand(1, 1, 64, 64).astype(np.float32),
    })
    return {k: np.asarray(v) for k, v in out.items()}


CASES = {
    "superpoint": _superpoint_outputs,
    "lightglue": _lightglue_outputs,
    "superglue": _superglue_outputs,
    "loftr": _loftr_outputs,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name, monkeypatch, tmp_path):
    # goldens pin DETERMINISTIC RANDOM-INIT numerics; keep the locally
    # trained fallback trees (utils.weights.local_trained_npz) out
    monkeypatch.setenv("IMCUI_WEIGHTS_DIR", str(tmp_path / "no_weights"))
    path = GOLDEN_DIR / f"{name}.npz"
    out = CASES[name]()
    if not path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        np.savez_compressed(path, **out)
        pytest.skip(f"golden {name} captured — commit {path}")
    golden = np.load(path)
    for key in golden.files:
        assert key in out, f"{name}: output key {key} disappeared"
        np.testing.assert_allclose(
            np.asarray(out[key], np.float64),
            np.asarray(golden[key], np.float64),
            atol=ATOL, err_msg=f"{name}.{key} drifted",
        )


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        import os

        os.environ["IMCUI_WEIGHTS_DIR"] = "/nonexistent"  # random init
        GOLDEN_DIR.mkdir(exist_ok=True)
        for name, fn in CASES.items():
            np.savez_compressed(GOLDEN_DIR / f"{name}.npz", **fn())
            print(f"regenerated {name}")
