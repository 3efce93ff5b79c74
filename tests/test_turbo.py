"""TurboMatcher serving-path test (tiny config, CPU)."""

import threading

import numpy as np
import pytest


@pytest.fixture(scope="module")
def turbo():
    from imcui_tpu.api.turbo import TurboMatcher

    tm = TurboMatcher(canvas=128, max_keypoints=64, n_layers=1,
                      batch_size=2, match_threshold=0.0,
                      num_hypotheses=64)
    yield tm
    tm.close()


def test_single_request(turbo, rng):
    img = (rng.rand(100, 120, 3) * 255).astype(np.uint8)
    out = turbo.match(img, img.copy())
    for key in ("keypoints0_orig", "mkeypoints0_orig", "mconf", "M",
                "num_inliers"):
        assert key in out
    mk0, mk1 = out["mkeypoints0_orig"], out["mkeypoints1_orig"]
    if len(mk0):
        # self pair: surviving correspondences are identities
        np.testing.assert_allclose(mk0, mk1, atol=1e-3)


def test_concurrent_requests_batch(turbo, rng):
    imgs = [(rng.rand(100, 120, 3) * 255).astype(np.uint8)
            for _ in range(4)]
    results = [None] * 4

    def worker(i):
        results[i] = turbo.match(imgs[i], imgs[i].copy())

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert all(r is not None for r in results)
    assert all("num_inliers" in r for r in results)
