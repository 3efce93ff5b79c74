#!/usr/bin/env python
"""Train LightGlue on homography pairs (the published pre-training
stage) — the TPU-native loop around imcui_tpu/train/step.py.

The reference webui is inference-only; this driver is the
beyond-reference training capability: one jitted XLA program per step,
dp over the pair batch × optional tp over the matcher hidden dims on a
(data, model) mesh, frozen SuperPoint supervision from on-device random
homographies, AdamW + cosine schedule, periodic match-recall eval on
held-out warps, and numpy-tree checkpoints that imcui_tpu's serving
path loads directly.

Usage (single chip or any mesh):
    python tools/train_lightglue.py --steps 2000 --batch 8 --size 512 \
        --model-parallel 1 --out runs/lg_homog

Feed real images by pointing --image-dir at a folder of photos; without
it the on-device synthetic corner-rich generator is used (no egress in
this environment).
"""

import argparse
import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from imcui_tpu.parallel import mesh as mesh_lib  # noqa: E402
from imcui_tpu.train import data, homography, step  # noqa: E402


def _load_image_dir(path, size):
    """Host-side image corpus → (N, 1, size, size) float32 [0, 1]."""
    import cv2

    files = sorted(
        p for p in pathlib.Path(path).iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg", ".ppm", ".bmp"))
    imgs = []
    for f in files:
        im = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
        if im is None:
            continue
        imgs.append(cv2.resize(im, (size, size)).astype(np.float32) / 255.0)
    if not imgs:
        raise SystemExit(f"no readable images under {path}")
    return np.stack(imgs)[:, None]


def eval_recall(lg_params, sp_params, images, key, max_keypoints, px=3.0):
    """Match recall of the CURRENT matcher on fresh held-out warps:
    fraction of GT correspondences recovered by mutual-argmax decoding."""
    from imcui_tpu.models.matchers import lightglue as lg
    from imcui_tpu.train import losses

    b, _, h, w = images.shape
    Hs = homography.sample_homographies(key, b, w, h)
    warped = homography.warp_images(images, Hs)
    from imcui_tpu.models.extractors import superpoint as sp
    both = jnp.concatenate([images, warped], 0)
    valid = jnp.tile(jnp.asarray([[w, h]], jnp.int32), (2 * b, 1))
    feats = sp.apply(sp_params, both, valid, max_keypoints=max_keypoints,
                     keypoint_threshold=0.0, precision="fp32")
    size_wh = jnp.asarray([w, h], jnp.float32)

    def one(k0, k1, d0, d1, m0, m1, Hm):
        scores, _, _ = step.forward_train(
            lg_params, k0, k1, d0, d1, m0, m1, size_wh, size_wh,
            remat=False)
        matches, _ = lg.filter_matches(scores[-1], 0.1, m0, m1)
        gt0, pos0, _, _ = losses.gt_correspondences(
            k0, k1, m0, m1, Hm, size_wh, px_pos=px)
        hit = (matches == gt0) & pos0
        return hit.sum(), pos0.sum()

    hits, total = jax.vmap(one)(
        feats["keypoints"][:b], feats["keypoints"][b:],
        feats["descriptors"][:b].transpose(0, 2, 1),
        feats["descriptors"][b:].transpose(0, 2, 1),
        feats["mask"][:b], feats["mask"][b:], Hs)
    return float(hits.sum()) / max(float(total.sum()), 1.0)


def save_tree(path, tree):
    from imcui_tpu.utils.weights import save_tree_npz

    save_tree_npz(path, tree)


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

    import optax

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    warmup = min(args.warmup, max(args.steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, args.steps)
    optimizer = step.make_optimizer(sched)
    lg_params, _, sp_params, _ = step.init_train_state(
        rng=jax.random.PRNGKey(args.seed), n_layers=args.n_layers,
        max_keypoints=args.max_keypoints, lr=args.lr)

    n_dev = len(jax.devices())
    mesh = mesh_lib.make_mesh(n_dev, model_parallel=args.model_parallel)
    lg_params = (mesh_lib.shard_lightglue_params(lg_params, mesh)
                 if args.model_parallel > 1
                 else mesh_lib.replicate(lg_params, mesh))
    opt_state = optimizer.init(lg_params)
    sp_params = mesh_lib.replicate(sp_params, mesh)
    tstep = step.make_train_step(
        optimizer, max_keypoints=args.max_keypoints,
        keypoint_threshold=0.0, remat=True)

    corpus = (_load_image_dir(args.image_dir, args.size)
              if args.image_dir else None)
    key = jax.random.PRNGKey(args.seed + 1)
    eval_imgs = data.synthetic_images(
        jax.random.PRNGKey(args.seed + 2), 4, args.size, args.size)

    log = open(out / "log.jsonl", "a")
    t0 = time.time()
    for it in range(args.steps):
        key, kd, ks = jax.random.split(key, 3)
        if corpus is not None:
            idx = np.asarray(
                jax.random.randint(kd, (args.batch,), 0, len(corpus)))
            images = jnp.asarray(corpus[idx])
        else:
            images = data.synthetic_images(
                kd, args.batch, args.size, args.size)
        images = mesh_lib.shard_batch([images], mesh)[0]
        with mesh:
            lg_params, opt_state, m = tstep(
                lg_params, opt_state, sp_params, images, ks)
        if it % 20 == 0 or it == args.steps - 1:
            m = {k: float(v) for k, v in m.items()}
            m.update(step=it, sec=round(time.time() - t0, 1))
            print(json.dumps(m))
            log.write(json.dumps(m) + "\n")
            log.flush()
        if args.eval_every and (it + 1) % args.eval_every == 0:
            r = eval_recall(lg_params, sp_params, eval_imgs,
                            jax.random.PRNGKey(it), args.max_keypoints)
            rec = {"step": it, "eval_recall": round(r, 4)}
            print(json.dumps(rec))
            log.write(json.dumps(rec) + "\n")
            log.flush()
            save_tree(out / f"lightglue_{it + 1:06d}.npz", lg_params)
    save_tree(out / "lightglue_final.npz", lg_params)
    print(f"saved {out / 'lightglue_final.npz'}")


if __name__ == "__main__":
    main()
