"""CosPlace global descriptor (reference contract:
imcui/hloc/extractors/cosplace.py:23-34 — torch.hub
``gmberton/cosplace`` ResNet trunk + L2 → GeM(learned p) → Linear → L2
aggregation head; default backbone ResNet50, fc_output_dim 2048).

The param tree mirrors the upstream network.py naming through rename
rules: the trunk is a torchvision Sequential (``backbone.0`` = conv1,
``backbone.4..7`` = layer1..4) and the head is ``aggregation.1.p`` (GeM
exponent) + ``aggregation.3`` (linear). EigenPlaces (eigenplaces.py)
shares this network verbatim, DIR (dir.py) maps the dirtorch naming onto
the same tree.
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..backbones.resnet import (gem_pool, init_resnet, init_resnet18,
                                resnet18_apply, resnet_apply)
from ..layers import init_linear, linear

# trunk output channels per torchvision backbone
FEAT_DIMS = {"ResNet18": 512, "ResNet50": 2048, "ResNet101": 2048}

COSPLACE_RENAME = (
    (r"^backbone\.0\.", "backbone.conv1."),
    (r"^backbone\.1\.", "backbone.bn1."),
    (r"^backbone\.4\.", "backbone.layer1."),
    (r"^backbone\.5\.", "backbone.layer2."),
    (r"^backbone\.6\.", "backbone.layer3."),
    (r"^backbone\.7\.", "backbone.layer4."),
    (r"^aggregation\.1\.p$", "gem.p"),
    (r"^aggregation\.3\.", "fc."),
)


def init_params(rng, backbone, fc_output_dim):
    k1, k2 = jax.random.split(rng)
    trunk = (init_resnet18(k1) if backbone == "ResNet18"
             else init_resnet(k1, backbone.lower()))
    return {
        "backbone": trunk,
        "gem": {"p": jnp.full((1,), 3.0, jnp.float32)},
        "fc": init_linear(k2, FEAT_DIMS[backbone], fc_output_dim),
    }


class CosPlace(BaseModel):
    default_conf = {
        "backbone": "ResNet50",
        "fc_output_dim": 2048,
    }
    required_inputs = ["image"]

    # checkpoint filename on the hub mirror; subclasses override
    def _checkpoint(self, conf):
        return f"cosplace_{conf['backbone']}_{conf['fc_output_dim']}.pth"

    def _init(self, conf, rng):
        backbone = conf["backbone"]
        init = init_params(jax.random.PRNGKey(0), backbone,
                           conf["fc_output_dim"])
        self.params, self.meta = load_params_auto(
            self._checkpoint(conf), init, type(self).__name__,
            rename=self._rename(),
        )

        @jax.jit
        def _apply(params, image):
            x = image.transpose(0, 2, 3, 1)
            mean = jnp.asarray([0.485, 0.456, 0.406])
            std = jnp.asarray([0.229, 0.224, 0.225])
            x = (x - mean) / std
            if backbone == "ResNet18":
                feats = resnet18_apply(params["backbone"], x)
            else:
                feats = resnet_apply(params["backbone"], x,
                                     backbone.lower())
            # upstream aggregation: L2Norm (channel) → GeM(p) → Linear → L2
            feats = feats / jnp.maximum(
                jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-8)
            g = gem_pool(feats, p=params["gem"]["p"])
            d = linear(params["fc"], g)
            return d / jnp.maximum(
                jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)

        self._apply = _apply

    def _rename(self):
        return COSPLACE_RENAME

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))
        return {"global_descriptor": self._apply(self.params, image)}
