#!/usr/bin/env python
"""Train LightGlue on homography pairs (the published pre-training
stage). Thin wrapper around imcui_tpu.train.drivers.train_lightglue —
also exposed as ``imcui-tpu train lightglue``.

Usage (single chip or any mesh):
    python tools/train_lightglue.py --steps 2000 --batch 8 --size 512 \
        --model-parallel 1 --out runs/lg_homog

Feed real images by pointing --image-dir at a folder of photos; without
it the on-device synthetic corner-rich generator is used (no egress in
this environment).
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from imcui_tpu.train.drivers import train_lightglue  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--max-keypoints", type=int, default=512)
    ap.add_argument("--n-layers", type=int, default=9)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--image-dir", default=None)
    ap.add_argument("--eval-every", type=int, default=200)
    ap.add_argument("--out", default="runs/lg_homog")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    train_lightglue(
        steps=args.steps, batch=args.batch, size=args.size,
        max_keypoints=args.max_keypoints, n_layers=args.n_layers,
        lr=args.lr, warmup=args.warmup, model_parallel=args.model_parallel,
        image_dir=args.image_dir, eval_every=args.eval_every,
        out=args.out, seed=args.seed)


if __name__ == "__main__":
    main()
