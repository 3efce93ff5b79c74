"""CosPlace global descriptor (reference contract:
imcui/hloc/extractors/cosplace.py:23 — torch.hub ResNet trunk + GeM
pooling + linear projection, used for retrieval)."""

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import download_checkpoint
from ..backbones.resnet import gem_pool, init_resnet18, resnet18_apply
from ..layers import init_linear, linear


class CosPlace(BaseModel):
    default_conf = {
        "backbone": "ResNet18",
        "fc_output_dim": 2048,
    }
    required_inputs = ["image"]

    def _init(self, conf, rng):
        k1, k2 = jax.random.split(rng)
        self.params = {
            "backbone": init_resnet18(k1),
            "fc": init_linear(k2, 512, conf["fc_output_dim"]),
        }
        path = download_checkpoint(
            f"cosplace_{conf['backbone']}_{conf['fc_output_dim']}.pth")
        self.meta = {"pretrained": False}  # conversion on availability
        del path

        import functools

        @functools.partial(jax.jit)
        def _apply(params, image):
            x = image.transpose(0, 2, 3, 1)
            mean = jnp.asarray([0.485, 0.456, 0.406])
            std = jnp.asarray([0.229, 0.224, 0.225])
            x = (x - mean) / std
            feats = resnet18_apply(params["backbone"], x)
            g = gem_pool(feats)
            d = linear(params["fc"], g)
            return d / jnp.maximum(
                jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)

        self._apply = _apply

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        if image.shape[1] == 1:
            image = jnp.tile(image, (1, 3, 1, 1))
        return {"global_descriptor": self._apply(self.params, image)}
