#!/usr/bin/env python
"""Train SuperPoint from scratch on the on-device synthetic corner
corpus (the MagicPoint stage of DeTone et al.) — see
imcui_tpu/train/superpoint.py for the recipe. The saved tree is the
serving tree: drop the .npz into utils/weights loading or pass it to
extractors.superpoint for immediate use by the flagship pipeline.

    python tools/train_superpoint.py --steps 5000 --batch 8 --size 160
"""

import argparse
import json
import pathlib
import sys
import time

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from imcui_tpu.parallel import mesh as mesh_lib  # noqa: E402
from imcui_tpu.train import superpoint as spt  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lambda-desc", type=float, default=1.0)
    ap.add_argument("--out", default="runs/sp_synth")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    params, opt_state, optimizer = spt.init_sp_train_state(
        jax.random.PRNGKey(args.seed), lr=args.lr)
    mesh = mesh_lib.make_mesh(len(jax.devices()), model_parallel=1)
    params = mesh_lib.replicate(params, mesh)
    opt_state = optimizer.init(params)
    tstep = spt.make_sp_train_step(
        optimizer, batch=args.batch, h=args.size, w=args.size,
        lambda_desc=args.lambda_desc)

    key = jax.random.PRNGKey(args.seed + 1)
    log = open(out / "log.jsonl", "a")
    t0 = time.time()
    for it in range(args.steps):
        key, ks = jax.random.split(key)
        with mesh:
            params, opt_state, m = tstep(params, opt_state, ks)
        if it % 50 == 0 or it == args.steps - 1:
            m = {k: round(float(v), 4) for k, v in m.items()}
            m.update(step=it, sec=round(time.time() - t0, 1))
            print(json.dumps(m))
            log.write(json.dumps(m) + "\n")
            log.flush()

    from imcui_tpu.utils.weights import save_tree_npz

    save_tree_npz(out / "superpoint_final.npz", params)
    print(f"saved {out / 'superpoint_final.npz'}")


if __name__ == "__main__":
    main()
