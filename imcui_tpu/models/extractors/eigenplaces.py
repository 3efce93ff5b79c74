"""EigenPlaces global descriptor (reference contract:
imcui/hloc/extractors/eigenplaces.py:32-47 — torch.hub
``gmberton/eigenplaces``, default ResNet101 + fc 2048; the network is the
same backbone+aggregation module as CosPlace, trained with the
EigenPlaces objective)."""

from .cosplace import CosPlace


class EigenPlaces(CosPlace):
    default_conf = {
        "variant": "EigenPlaces",
        "backbone": "ResNet101",
        "fc_output_dim": 2048,
    }

    def _checkpoint(self, conf):
        return (f"eigenplaces_{conf['backbone']}_"
                f"{conf['fc_output_dim']}.pth")
