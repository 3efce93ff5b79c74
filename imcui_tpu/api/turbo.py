"""Turbo serving path: the fused two-view step behind a micro-batcher.

The standard service (api/server.py) runs the flexible per-request
pipeline (any zoo entry, any resolution). This module is the
throughput-serving deployment of the flagship config (SURVEY §7.4): every
request is resized onto ONE static canvas, concurrent requests are
micro-batched (parallel/dispatch.py) into a fixed pair-batch, and a single
jitted program — SuperPoint → LightGlue → on-device RANSAC
(pipeline/two_view.py) — executes per batch, optionally sharded over the
device mesh. The compiled executable is reused for every request forever.
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np

from .. import logger
from ..parallel.dispatch import MicroBatcher
from ..pipeline import two_view
from ..utils import image as image_utils


class TurboMatcher:
    """High-throughput fixed-shape two-view matching service core."""

    def __init__(self, canvas=1024, max_keypoints=1024, n_layers=9,
                 batch_size=4, max_wait_ms=4.0, num_hypotheses=512,
                 match_threshold=0.1, mesh=None):
        self.canvas = canvas
        self.batch_size = batch_size
        self.params, self.meta = two_view.load_pretrained(
            n_layers=n_layers)
        self._step = two_view.make_jitted_step(
            max_keypoints=max_keypoints,
            n_layers=n_layers,
            num_hypotheses=num_hypotheses,
            match_threshold=match_threshold,
            ransac="fundamental",
        )
        if mesh is not None:
            from ..parallel import mesh as mesh_lib

            self.params = mesh_lib.shard_flagship_params(self.params, mesh)
        self._mesh = mesh
        self._key_lock = threading.Lock()
        self._key = jax.random.PRNGKey(0)
        # warm the executable at construction so no user request ever
        # pays the (minutes-long) XLA compile
        logger.info("TurboMatcher: compiling the serving executable...")
        dummy = np.zeros((canvas, canvas, 3), np.uint8)
        self._run_batch([(self._prep(dummy), self._prep(dummy))])

        self._batcher = MicroBatcher(
            self._run_batch, batch_size=batch_size,
            max_wait_ms=max_wait_ms)
        logger.info(
            f"TurboMatcher ready: canvas {canvas}, batch {batch_size}, "
            f"{n_layers}-layer matcher, pretrained="
            f"{self.meta['superpoint'].get('pretrained')}"
        )

    # -- host-side request prep -----------------------------------------

    def _prep(self, image):
        """RGB/gray ndarray → fixed canvas + valid size + rescale factor."""
        data = image_utils.preprocess(
            image, grayscale=True, resize_max=self.canvas, dfactor=8,
            buckets=(self.canvas,),
        )
        return data

    def _run_batch(self, items):
        b = len(items)
        n = self.batch_size
        im0 = np.zeros((n, 1, self.canvas, self.canvas), np.float32)
        im1 = np.zeros_like(im0)
        wh0 = np.ones((n, 2), np.int32)
        wh1 = np.ones((n, 2), np.int32)
        for i, (d0, d1) in enumerate(items):
            im0[i] = d0["image"][0]
            im1[i] = d1["image"][0]
            wh0[i] = d0["size"]
            wh1[i] = d1["size"]
        with self._key_lock:
            self._key, key = jax.random.split(self._key)
        out = self._step(self.params, jnp.asarray(im0), jnp.asarray(im1),
                         jnp.asarray(wh0), jnp.asarray(wh1), key)
        out = {k: np.asarray(v) for k, v in out.items()}
        results = []
        for i in range(b):
            results.append({k: v[i] for k, v in out.items()})
        return results

    # -- public API -------------------------------------------------------

    def match(self, image0, image1):
        """Match one pair; blocks until its micro-batch executes.

        Returns the reference-style keys at original resolution:
        mkeypoints0/1_orig (RANSAC-inlier correspondences), mconf, H/F
        matrix under "M", plus raw keypoints.
        """
        d0 = self._prep(image0)
        d1 = self._prep(image1)
        out = self._batcher.submit((d0, d1))

        s0 = d0["original_size"] / d0["size"]
        s1 = d1["original_size"] / d1["size"]
        matched = out["matches0"] > -1
        inl = out.get("inliers", matched) & matched
        mk0 = out["mkeypoints0"][inl]
        mk1 = out["mkeypoints1"][inl]
        return {
            "keypoints0_orig": image_utils.keypoints_to_original(
                out["keypoints0"][out["mask0"]], s0),
            "keypoints1_orig": image_utils.keypoints_to_original(
                out["keypoints1"][out["mask1"]], s1),
            "mkeypoints0_orig": image_utils.keypoints_to_original(mk0, s0),
            "mkeypoints1_orig": image_utils.keypoints_to_original(mk1, s1),
            "mconf": out["matching_scores0"][inl],
            "M": out.get("M"),
            "num_inliers": int(out.get("num_inliers", inl.sum())),
        }

    def close(self):
        self._batcher.close()
