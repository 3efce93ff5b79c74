"""Bisect the LightGlue training-step compile on the real chip.

Round-5 diagnostic: the full recipe (batch 8, 512 px, 512 kpts, 9 layers,
remat, Pallas attention fwd + custom-VJP bwd) hung XLA:TPU compilation for
>35 min through the axon tunnel and wedged the device for other clients.
This script compiles ONE train step at a parameterized size and prints
compile time + steady-state step time, so the pathological axis can be
found with bounded chip exposure. Run under `timeout`.

Usage: IMCUI_ATTN_XLA=1 timeout 900 python tools/smoke_lg_train.py \
    --layers 2 --batch 2 --size 256 --kpts 256 --no-remat --steps 3
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--kpts", type=int, default=256)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--no-remat", action="store_true")
    args = ap.parse_args()

    import jax

    from imcui_tpu.train import data, step

    print(json.dumps({"devices": str(jax.devices()),
                      "cfg": vars(args)}), flush=True)

    lg_params, opt_state, sp_params, optimizer = step.init_train_state(
        rng=jax.random.PRNGKey(0), n_layers=args.layers,
        max_keypoints=args.kpts)
    tstep = step.make_train_step(
        optimizer, max_keypoints=args.kpts, keypoint_threshold=0.0,
        remat=not args.no_remat)

    key = jax.random.PRNGKey(1)
    images = data.synthetic_images(key, args.batch, args.size, args.size)
    images.block_until_ready()
    print(json.dumps({"msg": "inputs ready, compiling"}), flush=True)

    t0 = time.time()
    lg_params, opt_state, m = tstep(lg_params, opt_state, sp_params,
                                    images, key)
    loss0 = float(m["loss"])
    t_compile = time.time() - t0
    print(json.dumps({"compile_s": round(t_compile, 1),
                      "loss0": round(loss0, 4)}), flush=True)

    t0 = time.time()
    for i in range(args.steps):
        key, ks = jax.random.split(key)
        lg_params, opt_state, m = tstep(lg_params, opt_state, sp_params,
                                        images, ks)
    lossN = float(m["loss"])  # blocks
    dt = (time.time() - t0) / args.steps
    print(json.dumps({"step_s": round(dt, 3),
                      "lossN": round(lossN, 4)}), flush=True)


if __name__ == "__main__":
    main()
