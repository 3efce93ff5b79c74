"""Deep Image Retrieval (DIR) global descriptor (reference contract:
imcui/hloc/extractors/dir.py:25-76 — dirtorch ``Resnet-101-AP-GeM``:
ResNet101 trunk + GeM pooling with a learned exponent + a 2048-d FC
whitening head).

The dirtorch checkpoint names the trunk at the top level (conv1/bn1/
layer1..4), the pooling exponent ``adpool.p`` and the projection
``fc``/``whiten`` — mapped onto the shared CosPlace-family tree."""

from .cosplace import CosPlace


class DIR(CosPlace):
    default_conf = {
        "model_name": "Resnet-101-AP-GeM",
        "backbone": "ResNet101",
        "fc_output_dim": 2048,
        "whiten_name": "Landmarks_clean",
    }

    def _checkpoint(self, conf):
        return f"dir/{conf['model_name']}.pt"

    def _rename(self):
        return (
            (r"^(conv1|bn1|layer\d)\.", r"backbone.\1."),
            (r"^adpool\.p$", "gem.p"),
            (r"^(?:whiten|fc)\.", "fc."),
        )
