"""Model caches (reference contract: imcui/ui/modelcache.py —
ARCSizeAwareModelCache + LRUModelCache with the same ``load_model(key,
loader, conf)`` API).

TPU notes: models hold JAX param pytrees in HBM. Size accounting walks the
pytree (nbytes); eviction drops the reference and lets the runtime free
the buffers — there is no CPU↔GPU migration dance because host RAM always
holds the numpy originals inside the checkpoint cache, and re-creation is
cheap relative to a compile-cache hit.
"""

import threading
from collections import OrderedDict

import jax

from .. import logger


def tree_nbytes(tree):
    return sum(
        x.nbytes for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "nbytes")
    )


class LRUModelCache:
    """Plain LRU cache (reference parity: imcui/ui/modelcache.py:281-407)."""

    def __init__(self, max_models=4, max_bytes=8 << 30):
        self.max_models = max_models
        self.max_bytes = max_bytes
        self._lock = threading.Lock()
        self._cache = OrderedDict()  # key -> (model, nbytes)

    def load_model(self, key, loader, conf):
        ckey = (key, _conf_key(conf))
        with self._lock:
            if ckey in self._cache:
                self._cache.move_to_end(ckey)
                return self._cache[ckey][0]
        model = loader(conf)
        nbytes = tree_nbytes(getattr(model, "params", None))
        with self._lock:
            self._cache[ckey] = (model, nbytes)
            self._cache.move_to_end(ckey)
            self._evict()
        return model

    def _evict(self):
        while len(self._cache) > self.max_models or (
            sum(n for _, n in self._cache.values()) > self.max_bytes
            and len(self._cache) > 1
        ):
            evicted_key, (evicted, n) = self._cache.popitem(last=False)
            logger.info(f"Evicting model {evicted_key} ({n / 1e6:.1f} MB)")

    def clear(self):
        with self._lock:
            self._cache.clear()


class ARCSizeAwareModelCache:
    """Adaptive replacement cache: balances recency (T1) vs frequency (T2)
    with ghost lists, size-aware eviction (reference parity:
    imcui/ui/modelcache.py:10-271)."""

    def __init__(self, max_bytes=8 << 30, max_models=6):
        self.max_bytes = max_bytes
        self.max_models = max_models
        self._lock = threading.Lock()
        self.t1 = OrderedDict()  # recently used once: key -> (model, nbytes)
        self.t2 = OrderedDict()  # frequently used
        self.b1 = OrderedDict()  # ghost of t1 (keys only)
        self.b2 = OrderedDict()  # ghost of t2
        self.p = 0  # adaptation parameter (target size of t1, in entries)

    def _total_bytes(self):
        return sum(n for _, n in self.t1.values()) + sum(
            n for _, n in self.t2.values()
        )

    def _total_models(self):
        return len(self.t1) + len(self.t2)

    def _replace(self, in_b2):
        if self.t1 and (
            len(self.t1) > self.p or (in_b2 and len(self.t1) == self.p)
        ):
            key, (model, n) = self.t1.popitem(last=False)
            self.b1[key] = None
            logger.info(f"ARC evict from T1: {key} ({n / 1e6:.1f} MB)")
        elif self.t2:
            key, (model, n) = self.t2.popitem(last=False)
            self.b2[key] = None
            logger.info(f"ARC evict from T2: {key} ({n / 1e6:.1f} MB)")
        # trim ghosts
        while len(self.b1) > self.max_models:
            self.b1.popitem(last=False)
        while len(self.b2) > self.max_models:
            self.b2.popitem(last=False)

    def load_model(self, key, loader, conf):
        ckey = (key, _conf_key(conf))
        with self._lock:
            if ckey in self.t1:
                model, n = self.t1.pop(ckey)
                self.t2[ckey] = (model, n)
                return model
            if ckey in self.t2:
                self.t2.move_to_end(ckey)
                return self.t2[ckey][0]

        model = loader(conf)
        nbytes = tree_nbytes(getattr(model, "params", None))

        with self._lock:
            if ckey in self.b1:
                self.p = min(self.max_models,
                             self.p + max(1, len(self.b2) // max(len(self.b1), 1)))
                del self.b1[ckey]
                self._replace(False)
                self.t2[ckey] = (model, nbytes)
            elif ckey in self.b2:
                self.p = max(0,
                             self.p - max(1, len(self.b1) // max(len(self.b2), 1)))
                del self.b2[ckey]
                self._replace(True)
                self.t2[ckey] = (model, nbytes)
            else:
                self.t1[ckey] = (model, nbytes)
            while (
                self._total_models() > self.max_models
                or self._total_bytes() > self.max_bytes
            ) and self._total_models() > 1:
                self._replace(False)
        return model

    def clear(self):
        with self._lock:
            self.t1.clear()
            self.t2.clear()
            self.b1.clear()
            self.b2.clear()
            self.p = 0


def _conf_key(conf):
    """Hashable digest of a (nested) conf dict."""
    if isinstance(conf, dict):
        return tuple(sorted((k, _conf_key(v)) for k, v in conf.items()))
    if isinstance(conf, (list, tuple)):
        return tuple(_conf_key(v) for v in conf)
    return conf


_GLOBAL_CACHE = None


def get_global_cache():
    global _GLOBAL_CACHE
    if _GLOBAL_CACHE is None:
        _GLOBAL_CACHE = ARCSizeAwareModelCache()
    return _GLOBAL_CACHE
