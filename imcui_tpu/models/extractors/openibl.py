"""OpenIBL SFRS global descriptor (reference contract:
imcui/hloc/extractors/openibl.py:7 — torch.hub vgg16_netvlad: the same
VGG16+NetVLAD architecture as our netvlad module, SFRS-trained weights)."""

from .netvlad import NetVLAD


class OpenIBL(NetVLAD):
    default_conf = {
        "model_name": "vgg16_netvlad",
        "whiten": True,
    }
