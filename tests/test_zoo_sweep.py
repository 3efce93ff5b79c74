"""Zoo-sweep integration test (reference pattern: tests/test_basic.py:13-35
test_all — iterate the whole matcher zoo on one real image pair through
ImageMatchingAPI; entries tagged skip_ci are skipped, mirroring the
reference's CI cost-control flag)."""

import os

import numpy as np
import pytest

from imcui_tpu.api.core import ImageMatchingAPI
from imcui_tpu.ui.utils import get_matcher_zoo, load_config
from imcui_tpu.utils.image import read_image

IMG0 = "/root/reference/tests/data/02928139_3448003521.jpg"
IMG1 = "/root/reference/tests/data/17295357_9106075285.jpg"

cfg = load_config("/root/repo/config/app.yaml")
ZOO = get_matcher_zoo(cfg["matcher_zoo"])
# IMCUI_ZOO_SWEEP=all (the scheduled zoo-slow CI lane) sweeps every
# entry, skip_ci included; the default fast lane honours skip_ci.
if os.environ.get("IMCUI_ZOO_SWEEP") == "all":
    KEYS = sorted(ZOO)
else:
    KEYS = [k for k, v in ZOO.items() if not v.get("skip_ci", False)]


def small_preprocessing(conf):
    """Shrink resolution so the sweep stays CPU-friendly."""
    out = dict(conf)
    for section in ("feature", "matcher"):
        if section in out and out[section] and \
                "preprocessing" in out[section]:
            pre = dict(out[section]["preprocessing"])
            pre["resize_max"] = 256
            pre["force_resize"] = False
            out[section] = {**out[section], "preprocessing": pre}
    return out


@pytest.fixture(autouse=True)
def _clear_caches_per_entry():
    """Each zoo entry compiles its own multi-MB programs; clearing per
    test (not just per module) keeps the sweep's RSS flat — see
    conftest._bounded_compile_cache for the crash this bounds."""
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()


@pytest.mark.parametrize("key", KEYS)
def test_zoo_entry(key):
    conf = small_preprocessing(ZOO[key])
    if not conf.get("standalone", False):
        conf["feature"]["model"]["max_keypoints"] = 256
        conf["feature"]["model"].setdefault("keypoint_threshold", 0.0)
    api = ImageMatchingAPI(conf=conf, detect_threshold=1e-4,
                           max_keypoints=256)
    img0 = read_image(IMG0)
    img1 = read_image(IMG1)
    pred = api(img0, img1)
    assert pred is not None
    assert "mkeypoints0_orig" in pred
    assert len(pred["mkeypoints0_orig"]) == len(pred["mkeypoints1_orig"])
    # identity sanity on a self pair: every zoo entry must produce
    # self-consistent matches
    pred_self = api(img0, img0.copy())
    mk0 = np.asarray(pred_self["mkeypoints0_orig"])
    mk1 = np.asarray(pred_self["mkeypoints1_orig"])
    # Self-consistency at RANDOM init only holds for similarity/
    # correlation-style matchers (identical inputs → symmetric score
    # maps → identity matches). Regression-style models — warp fields
    # (RoMa/DKM family), pointmap heads (DUSt3R/MASt3R), two-sided
    # subpixel refiners (XoFTR), pose-conditioned attention (IMP) —
    # output arbitrary geometry until real weights load, so their px
    # bar applies only once meta reports a converted checkpoint.
    # (The correlation stand-ins these replaced passed by construction;
    # the published architectures rightly don't at random init.)
    regression_style = bool(
        getattr(api.matcher, "meta", None)
        and not api.matcher.meta.get("pretrained", False)
        and any(tag in key.lower()
                for tag in ("roma", "dkm", "dust3r", "mast3r", "duster",
                            "xoftr", "imp", "cotr", "mickey"))
    )
    if len(mk0) > 8 and not regression_style:
        err = np.abs(mk0 - mk1).max(-1)
        assert np.median(err) < 8.0, f"{key}: self-pair disagreement"
    elif len(mk0) > 8:
        assert np.all(np.isfinite(mk0)) and np.all(np.isfinite(mk1)), key
