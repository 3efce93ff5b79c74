"""Template dense matcher for contributors (the matcher-side analog of
extractors/example.py; reference zoo entry: config/app.yaml `Example`,
disabled by default). Shows the dense-matcher conventions: functional
params, one jitted batched apply, fixed-shape masked outputs."""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import download_checkpoint


def init_params(rng):
    return {}


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    download_checkpoint("example/" + conf.get("model_name", "example.pth"))
    return init, {"pretrained": False}


@functools.partial(jax.jit, static_argnames=("threshold",))
def _apply_batched(params, image0, image1, threshold):
    b, _, h, w = image0.shape
    n = 512
    zeros = jnp.zeros((b, n, 2))
    return {"keypoints0": zeros, "keypoints1": zeros,
             "scores": jnp.zeros((b, n)),
             "mask": jnp.zeros((b, n), bool)}


class Example(BaseModel):
    default_conf = {
        "model_name": "example.pth",
        "match_threshold": 0.2,
        "max_keypoints": 2048,
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)

    def _forward(self, data):
        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)
        out = _apply_batched(self.params, image0, image1,
                             float(self.conf["match_threshold"]))
        out["mconf"] = out["scores"]
        return out
