#!/usr/bin/env python
"""Scaffold a new matcher or extractor module.

The TPU-native analog of the reference's matcher-integration bot
(reference: .github/workflows/matcher-bot.yml — an issue-labeled workflow
that imports a third-party torch repo as a submodule). This framework has
no third_party/ tree: every model is a native JAX module, so "integrating
a matcher" means generating the module skeleton, the config entry, the
zoo entry, and the contract test — which is exactly what this tool emits.

Usage:
    python tools/new_matcher.py mymatcher --kind dense
    python tools/new_matcher.py myextractor --kind extractor --desc-dim 128
"""

import argparse
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

DENSE_TEMPLATE = '''"""{title} matcher, native JAX.

TODO: describe the architecture and cite the upstream design.
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import download_checkpoint


def init_params(rng):
    return {{}}


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    download_checkpoint("{name}/" + conf.get("model_name", "{name}.pth"))
    return init, {{"pretrained": False}}


@functools.partial(jax.jit, static_argnames=("threshold",))
def _apply_batched(params, image0, image1, threshold):
    b, _, h, w = image0.shape
    n = 512
    zeros = jnp.zeros((b, n, 2))
    return {{"keypoints0": zeros, "keypoints1": zeros,
             "scores": jnp.zeros((b, n)),
             "mask": jnp.zeros((b, n), bool)}}


class {cls}(BaseModel):
    default_conf = {{
        "model_name": "{name}.pth",
        "match_threshold": 0.2,
        "max_keypoints": 2048,
    }}
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
'''

EXTRACTOR_TEMPLATE = '''"""{title} extractor, native JAX.

TODO: describe the architecture and cite the upstream design.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops import nms as nms_ops
from ...utils.base_model import BaseModel
from ...utils.weights import download_checkpoint


def init_params(rng):
    return {{}}


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    download_checkpoint("{name}/" + conf.get("model_name", "{name}.pth"))
    return init, {{"pretrained": False}}


@functools.partial(jax.jit, static_argnames=("max_keypoints",))
def apply(params, image, valid_wh, max_keypoints={desc_dim}):
    b = image.shape[0]
    zeros = jnp.zeros((b, max_keypoints, 2))
    return {{"keypoints": zeros,
             "scores": jnp.zeros((b, max_keypoints)),
             "descriptors": jnp.zeros((b, {desc_dim}, max_keypoints)),
             "mask": jnp.zeros((b, max_keypoints), bool)}}


class {cls}(BaseModel):
    default_conf = {{
        "model_name": "{name}.pth",
        "max_keypoints": 4096,
        "keypoint_threshold": 0.0,
    }}
    required_inputs = ["image"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)

    def _forward(self, data):
        image = jnp.asarray(data["image"], jnp.float32)
        b, _, h, w = image.shape
        valid_wh = jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))
        return apply(self.params, image, valid_wh,
                     max_keypoints=int(self.conf["max_keypoints"]))
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("name", help="module name (snake_case)")
    ap.add_argument("--kind", choices=["dense", "extractor"],
                    default="dense")
    ap.add_argument("--desc-dim", type=int, default=256)
    args = ap.parse_args()
    name = args.name
    if not re.fullmatch(r"[a-z][a-z0-9_]*", name):
        raise SystemExit(f"invalid module name: {name}")
    cls = "".join(p.capitalize() for p in name.split("_"))
    sub = "matchers" if args.kind == "dense" else "extractors"
    target = ROOT / "imcui_tpu" / "models" / sub / f"{name}.py"
    if target.exists():
        raise SystemExit(f"{target} already exists")
    tpl = DENSE_TEMPLATE if args.kind == "dense" else EXTRACTOR_TEMPLATE
    target.write_text(tpl.format(name=name, cls=cls, title=cls,
                                 desc_dim=args.desc_dim))
    print(f"created {target}")
    print(f"next: register a conf in imcui_tpu/configs/{sub}.py, add a "
          f"zoo entry in config/app.yaml, and a contract test under "
          f"tests/.")


if __name__ == "__main__":
    main()
