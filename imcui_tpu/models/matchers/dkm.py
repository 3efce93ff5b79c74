"""DKM warp-regression matcher (reference contract:
imcui/hloc/matchers/dkm.py:13 — same warp-regression family as RoMa; see
roma.py for the architecture scope note)."""

from .roma import Roma


class DKMv3(Roma):
    default_conf = {
        **Roma.default_conf,
        "model_name": "DKMv3_outdoor.pth",
    }
