#!/usr/bin/env python
"""Rebuild the training photo corpus as a symlink directory.

The corpus used to train `weights/superpoint_adapted.npz` (and the
LightGlue checkpoint) is the 235-photo subset of the reference demo
datasets listed in `data/corpus_manifest.txt` — every image under
/root/reference/imcui/datasets EXCEPT the accuracy-gate photo
`02928139_3448003521` and its rot/scale derivatives (the gate photo
must stay held out; see weights/README.md for the leak history).

The symlink directories themselves are NOT committed (they dangle on
any checkout without /root/reference — advisor r4); run this script to
recreate them before training:

    python tools/make_corpus.py --out runs/corpus_clean
"""

import argparse
import pathlib

GATE_STEM = "02928139_3448003521"
DEFAULT_ROOT = "/root/reference/imcui/datasets"


def build(root, out, manifest=None):
    root = pathlib.Path(root)
    out = pathlib.Path(out)
    out.mkdir(parents=True, exist_ok=True)
    if manifest:
        rels = [ln.strip() for ln in open(manifest) if ln.strip()]
        files = [root / r for r in rels]
    else:
        files = sorted(
            p for p in root.rglob("*")
            if p.suffix.lower() in (".png", ".jpg", ".jpeg", ".ppm", ".bmp")
            and GATE_STEM not in p.name)
    n = 0
    for i, src in enumerate(files):
        if not src.exists():
            raise FileNotFoundError(src)
        dst = out / f"img{i:03d}{src.suffix}"
        if dst.is_symlink() or dst.exists():
            dst.unlink()
        dst.symlink_to(src)
        n += 1
    print(f"{n} symlinks under {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=DEFAULT_ROOT)
    ap.add_argument("--out", default="runs/corpus_clean")
    ap.add_argument("--manifest", default="data/corpus_manifest.txt",
                    help="relative-path list; pass '' to glob fresh")
    args = ap.parse_args()
    build(args.root, args.out, args.manifest or None)


if __name__ == "__main__":
    main()
