#!/usr/bin/env python
"""Train SuperPoint from scratch on the on-device synthetic corner
corpus (the MagicPoint stage of DeTone et al.). Thin wrapper around
imcui_tpu.train.drivers.train_superpoint — also exposed as
``imcui-tpu train superpoint``. The saved tree is the serving tree:
drop the .npz into utils/weights loading or pass it to
extractors.superpoint for immediate use by the flagship pipeline.

    python tools/train_superpoint.py --steps 5000 --batch 8 --size 160
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from imcui_tpu.train.drivers import train_superpoint  # noqa: E402


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
    train_superpoint(
        steps=args.steps, batch=args.batch, size=args.size, lr=args.lr,
        lambda_desc=args.lambda_desc, out=args.out, seed=args.seed)


if __name__ == "__main__":
    main()
