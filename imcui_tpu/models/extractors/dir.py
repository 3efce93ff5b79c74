"""Deep Image Retrieval (DIR) global descriptor (reference contract:
imcui/hloc/extractors/dir.py:25 — ResNet trunk + generalised-mean pooling
+ whitening, the same architecture family as our CosPlace module)."""

from .cosplace import CosPlace


class DIR(CosPlace):
    default_conf = {
        "backbone": "ResNet18",
        "fc_output_dim": 2048,
        "model_name": "Resnet-AP-GeM",
    }
