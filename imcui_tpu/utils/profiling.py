"""Tracing / profiling utilities (SURVEY §5: the reference has only ad-hoc
wall-clock logs — imcui/ui/utils.py:926,989,1032,1053,1064; here we add
structured per-stage timing plus real device traces via jax.profiler)."""

import contextlib
import time
from collections import defaultdict

import jax

from .. import logger


class StageTimer:
    """Accumulates wall-clock per named stage; prints a summary table."""

    def __init__(self, name="pipeline"):
        self.name = name
        self.times = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, stage_name, block=False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block:
                # only meaningful when the stage returns device values the
                # caller already holds; callers pass block=True after
                # jax.block_until_ready
                pass
            dt = time.perf_counter() - t0
            self.times[stage_name] += dt
            self.counts[stage_name] += 1
            logger.info(f"[{self.name}] {stage_name}: {dt*1000:.1f} ms")

    def summary(self):
        return {
            k: {"total_s": self.times[k], "calls": self.counts[k],
                "mean_ms": 1000.0 * self.times[k] / max(self.counts[k], 1)}
            for k in self.times
        }


@contextlib.contextmanager
def device_trace(log_dir="/tmp/imcui_tpu_trace"):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info(f"device trace written to {log_dir}")


def annotate(name):
    """Named region that shows up inside device traces."""
    return jax.profiler.TraceAnnotation(name)
