"""Decompose the RoMa refiner cost (r3: refiner@16 = 32 ms at 40x40!).

Per scale, time: (a) the conv stack alone, (b) one bilinear_warp,
(c) local_correlation alone, (d) full refiner_apply. Also an MXU
reformulation probe for the local correlation: all-pairs C = F0 F1^T
on the MXU, then bilinear interpolation of SCALAR correlations
(linearity of the dot product moves the interpolation outside).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imcui_tpu.models.matchers import roma
from imcui_tpu.utils.benchmark import chain_bench

R = 560
GRIDS = {"16": 40, "8": 70, "4": 140, "2": 280, "1": 560}
# "16" is the DINOv2 patch-14 grid (560/14 = 40) — match_gp projects
# dinov2 features there; the VGG pyramid supplies 8/4/2/1.


def _bf16(t):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)


params = _bf16(roma.init_params(jax.random.PRNGKey(0),
                                {"dinov2_variant": "vitl14"}))


def mk(scale, key):
    cfg = roma.REFINERS[scale]
    g = GRIDS[scale]
    ks = jax.random.split(key, 4)
    f0 = jax.random.normal(ks[0], (g, g, cfg["feat"]), jnp.bfloat16)
    f1 = jax.random.normal(ks[1], (g, g, cfg["feat"]), jnp.bfloat16)
    warp = jax.random.uniform(ks[2], (g, g, 2), jnp.float32) * 2 - 1
    cert = jax.random.uniform(ks[3], (g, g), jnp.float32)
    return cfg, f0, f1, warp, cert


def main():
    for scale in ("16", "8", "4", "2", "1"):
        cfg = roma.REFINERS[scale]
        g = GRIDS[scale]

        def full(params, key, acc, scale=scale):
            cfg, f0, f1, warp, cert = mk(scale, key)
            w2, c2 = roma.refiner_apply(params["conv_refiner"][scale],
                                        cfg, f0, f1, warp, cert)
            return acc + w2.sum() + c2.sum()

        def warp1(params, key, acc, scale=scale):
            cfg, f0, f1, warp, cert = mk(scale, key)
            s = roma.bilinear_warp(f1, warp)
            return acc + s.astype(jnp.float32).sum()

        def corr(params, key, acc, scale=scale):
            cfg, f0, f1, warp, cert = mk(scale, key)
            if not cfg["r"]:
                return acc
            c = roma.local_correlation(f0, f1, warp, cfg["r"])
            return acc + c.astype(jnp.float32).sum()

        def corr_mxu(params, key, acc, scale=scale):
            cfg, f0, f1, warp, cert = mk(scale, key)
            if not cfg["r"] or GRIDS[scale] ** 2 > 8192:
                return acc  # all-pairs matrix too large at fine scales
            h, w, d = f0.shape
            r = cfg["r"]
            # all-pairs on the MXU, then scalar bilinear window reads
            C = jax.lax.dot_general(
                f0.reshape(h * w, d), f1.reshape(h * w, d),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) / jnp.sqrt(
                    jnp.float32(d))                       # (hw, hw)
            # integer corner of warp in f1 pixel space
            px = (warp[..., 0] + 1) * w / 2 - 0.5
            py = (warp[..., 1] + 1) * h / 2 - 0.5
            x0 = jnp.floor(px)
            y0 = jnp.floor(py)
            ax = (px - x0)[..., None]
            ay = (py - y0)[..., None]
            offs = jnp.arange(-r, r + 1)
            p = jnp.arange(h * w)

            def row_gather(dy, dx):
                # C[p, (y0+dy)*w + x0+dx] with zero padding OOB
                yy = y0 + dy
                xx = x0 + dx
                ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
                q = (jnp.clip(yy, 0, h - 1) * w
                     + jnp.clip(xx, 0, w - 1)).astype(jnp.int32)
                v = C[p.reshape(h, w), q]
                return jnp.where(ok, v, 0.0)

            outs = []
            for dy in offs:
                for dx in offs:
                    c00 = row_gather(dy, dx)
                    c01 = row_gather(dy, dx + 1)
                    c10 = row_gather(dy + 1, dx)
                    c11 = row_gather(dy + 1, dx + 1)
                    v = ((1 - ay[..., 0]) * ((1 - ax[..., 0]) * c00
                                             + ax[..., 0] * c01)
                         + ay[..., 0] * ((1 - ax[..., 0]) * c10
                                         + ax[..., 0] * c11))
                    outs.append(v)
            return acc + sum(o.sum() for o in outs)

        def convs(params, key, acc, scale=scale):
            cfg, f0, f1, warp, cert = mk(scale, key)
            in_dim = roma._refiner_in_dim(cfg)
            x = jax.random.normal(key, (1, g, g, in_dim), jnp.bfloat16)
            p = params["conv_refiner"][scale]
            x = roma._refiner_block(p["block1"], x, cfg["dw"])
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *p["hidden_blocks"])
            x, _ = jax.lax.scan(
                lambda h, blk: (roma._refiner_block(blk, h, cfg["dw"]),
                                None), x, stacked)
            from imcui_tpu.models.layers import conv2d
            return acc + conv2d(p["out_conv"], x).sum()

        for name, fn in (("full", full), ("warp1", warp1),
                         ("corr", corr), ("corr_mxu", corr_mxu),
                         ("convs", convs)):
            dt, _ = chain_bench(fn, params, iters=10, warmup=2)
            print(f"scale{scale} {name}: {1000 * dt / 10:.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
