"""imcui_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image-matching framework.

A from-scratch rebuild of the capabilities of Vincentqyw/image-matching-webui
(reference: /root/reference) designed TPU-first:

- fixed-shape, mask-padded tensors everywhere (keypoints padded to
  ``max_keypoints``; ``matches0 == -1`` convention preserved) so XLA compiles
  once per config instead of once per image,
- functional models (param pytree + jitted ``apply``) behind the reference's
  dict-in/dict-out ``BaseModel`` protocol (reference:
  imcui/hloc/utils/base_model.py:9-35),
- on-device vmapped RANSAC instead of the per-pair OpenCV/poselib CPU hop
  (reference: imcui/ui/utils.py:326-456),
- pair-batched throughput over a ``jax.sharding.Mesh`` instead of Ray-Serve
  process replication (reference: imcui/api/server.py:42-64).

Logger setup mirrors the reference package logger
(reference: imcui/hloc/__init__.py:12-42).
"""

import logging
import os
import sys

__version__ = "0.1.0"

# Persistent XLA compilation cache: TPU compiles of the conv trunks take
# minutes at new shapes; caching them on disk makes every later process
# start warm. Opt out with IMCUI_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get("IMCUI_TPU_NO_COMPILE_CACHE"):
    try:
        import jax

        _cache_dir = os.environ.get(
            "IMCUI_TPU_COMPILE_CACHE",
            os.path.expanduser("~/.cache/imcui_tpu/xla"),
        )
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover — cache is best-effort
        pass

formatter = logging.Formatter(
    fmt="[%(asctime)s %(name)s %(levelname)s] %(message)s",
    datefmt="%Y/%m/%d %H:%M:%S",
)

logger = logging.getLogger("imcui_tpu")
logger.setLevel(logging.INFO)
if not logger.handlers:
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(formatter)
    handler.setLevel(logging.INFO)
    logger.addHandler(handler)
logger.propagate = False

# HuggingFace hub repo holding converted checkpoints (reference:
# imcui/hloc/__init__.py:65-66 uses Realcat/imcui_checkpoints). Weight
# download is gated: offline environments fall back to deterministic
# random initialisation (see utils/weights.py).
MODEL_REPO_ID = "Realcat/imcui_checkpoints"
DATASETS_REPO_ID = "Realcat/imcui_datasets"


def read_logs(log_path="log.txt"):
    """Return the contents of the log file if present (reference:
    imcui/hloc/__init__.py:33-42)."""
    try:
        with open(log_path) as f:
            return f.read()
    except FileNotFoundError:
        return ""
