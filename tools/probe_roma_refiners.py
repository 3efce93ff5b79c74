"""Per-scale probe of the RoMa refiner pyramid on the real chip.

BASELINE.md r3 attributes ~41 ms of the 101 ms/pair to the fine
refiners (scales 8/4/2/1); their MXU FLOPs only account for ~9 ms, so
this probe times each scale's refiner_apply in isolation (plus the
inter-scale resizes) to locate the overhead before attacking it.
"""

import jax
import jax.numpy as jnp

from imcui_tpu.models.matchers import roma
from imcui_tpu.utils.benchmark import chain_bench

BASE = 560
ITERS = 20


def main():
    rng = jax.random.PRNGKey(0)
    params = roma.init_params(rng)

    # scale "16" runs on the 40x40 DINOv2 grid; fine scales on the VGG
    # pyramid at BASE/s
    shapes = {"16": (40, 40), "8": (70, 70), "4": (140, 140),
              "2": (280, 280), "1": (560, 560)}
    for s, (h, w) in shapes.items():
        cfg = roma.REFINERS[s]
        f0 = jax.random.normal(jax.random.fold_in(rng, 1),
                               (h, w, cfg["feat"]), jnp.bfloat16)
        f1 = jax.random.normal(jax.random.fold_in(rng, 2),
                               (h, w, cfg["feat"]), jnp.bfloat16)
        warp0 = roma.coord_grid(h, w).reshape(h, w, 2)
        cert0 = jnp.zeros((h, w))
        p = params["conv_refiner"][s]

        def step(p, key, acc, f0=f0, f1=f1, warp0=warp0, cert0=cert0,
                 cfg=cfg):
            n = jax.random.normal(key, (1,), jnp.bfloat16)[0]
            warp, cert = roma.refiner_apply(
                p, cfg, f0 + n.astype(f0.dtype), f1, warp0, cert0)
            return acc + warp.astype(jnp.float32).sum() * 0 + \
                cert.astype(jnp.float32).sum() * 1e-12 + acc * 0

        dt, _ = chain_bench(step, p, ITERS)
        print(f"refiner@{s:>2} {h}x{w} feat={cfg['feat']} "
              f"dw={cfg['dw']}: {dt / ITERS * 1e3:7.2f} ms")

    # inter-scale resizes of warp+cert
    for (hs, ws) in [(70, 70), (140, 140), (280, 280), (560, 560)]:
        src = jax.random.normal(rng, (hs // 2, ws // 2, 3))

        def step(p, key, acc, src=src, hs=hs, ws=ws):
            n = jax.random.normal(key, (1,))[0]
            out = roma._resize(src + n, hs, ws)
            return acc + out.sum() * 1e-12

        dt, _ = chain_bench(step, None, ITERS)
        print(f"resize→{hs}x{ws}: {dt / ITERS * 1e3:7.2f} ms")

    # warp + local correlation in isolation at the corr scales
    for s in ("16", "8", "4"):
        h, w = shapes[s]
        cfg = roma.REFINERS[s]
        f0 = jax.random.normal(rng, (h, w, cfg["feat"]), jnp.bfloat16)
        f1 = jax.random.normal(rng, (h, w, cfg["feat"]), jnp.bfloat16)
        warp0 = roma.coord_grid(h, w).reshape(h, w, 2)

        def stepw(p, key, acc, f1=f1, warp0=warp0):
            n = jax.random.normal(key, (1,), jnp.bfloat16)[0]
            out = roma.bilinear_warp(f1 + n, warp0)
            return acc + out.astype(jnp.float32).sum() * 1e-12

        dt, _ = chain_bench(stepw, None, ITERS)
        print(f"bilinear_warp@{s:>2}: {dt / ITERS * 1e3:7.2f} ms")
        if cfg["r"]:
            def stepc(p, key, acc, f0=f0, f1=f1, warp0=warp0, cfg=cfg):
                n = jax.random.normal(key, (1,), jnp.bfloat16)[0]
                out = roma.local_correlation(f0 + n, f1, warp0, cfg["r"])
                return acc + out.astype(jnp.float32).sum() * 1e-12

            dt, _ = chain_bench(stepc, None, ITERS)
            print(f"local_corr@{s:>2} r={cfg['r']}: "
                  f"{dt / ITERS * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
