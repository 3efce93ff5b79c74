"""EigenPlaces global descriptor (reference contract:
imcui/hloc/extractors/eigenplaces.py:32 — same ResNet+GeM+FC family as
CosPlace, trained with the EigenPlaces objective; torch.hub upstream)."""

from .cosplace import CosPlace


class EigenPlaces(CosPlace):
    default_conf = {
        "backbone": "ResNet18",
        "fc_output_dim": 2048,
        "model_name": "eigenplaces",
    }
