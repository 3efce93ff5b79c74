"""Model protocol + plugin discovery.

TPU-native re-design of the reference's ``BaseModel`` (reference:
imcui/hloc/utils/base_model.py:9-55). The public contract is identical —
``Model(conf)`` merges ``default_conf`` with the user conf, asserts
``required_inputs`` are present, and dispatches dict-in → dict-out — but the
implementation is functional JAX instead of ``torch.nn.Module``:

- parameters live in ``self.params`` (a pytree of jnp arrays),
- the compute path is a pure function ``_forward(params, data)`` compiled
  once per static config via ``jax.jit``,
- all outputs are fixed-shape and mask-padded so a single XLA executable
  serves every input (the reference's dynamic keypoint counts recompile
  nothing here).
"""

import importlib
import inspect
from abc import ABC, abstractmethod
from copy import deepcopy

import jax


def merge_confs(default, user):
    """Recursively merge a user conf over a default conf."""
    out = deepcopy(default)
    for k, v in (user or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_confs(out[k], v)
        else:
            out[k] = v
    return out


class BaseModel(ABC):
    """dict-in/dict-out model protocol (reference parity:
    imcui/hloc/utils/base_model.py:9-35)."""

    default_conf = {}
    required_inputs = []

    def __init__(self, conf=None, rng=None):
        self.conf = merge_confs(self.default_conf, conf)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        self._init(self.conf, rng)

    def __call__(self, data):
        """Check required inputs then dispatch to the jitted forward."""
        for key in self.required_inputs:
            assert key in data, f"Missing key {key} in data"
        return self._forward(data)

    @abstractmethod
    def _init(self, conf, rng):
        """Build params (pytree) and the jitted apply function."""
        raise NotImplementedError

    @abstractmethod
    def _forward(self, data):
        raise NotImplementedError


def dynamic_load(root, model):
    """Import ``<root>.<model>`` and return its unique BaseModel subclass
    (reference parity: imcui/hloc/utils/base_model.py:46-55)."""
    module_path = f"{root.__name__}.{model}"
    module = importlib.import_module(module_path)
    classes = inspect.getmembers(module, inspect.isclass)
    classes = [c for c in classes if c[1].__module__ == module_path]
    classes = [c for c in classes if issubclass(c[1], BaseModel)]
    assert len(classes) == 1, classes
    return classes[0][1]
