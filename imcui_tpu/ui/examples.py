"""Examples generator for the WebUI gallery (reference contract:
imcui/ui/utils.py:142-310 — HF dataset download, sacre_coeur pair combos,
rotation pairs 45–315°, scale pairs, algorithm distribution with a
rotation-robust subset)."""

import random
from itertools import combinations
from pathlib import Path

import cv2
import numpy as np

from .. import DATASETS_REPO_ID, logger

EXAMPLE_ALGOS = [
    "superpoint+lightglue",
    "superglue",
    "superpoint+mnn",
    "superpoint+dual-softmax",
    "loftr",
]
EXAMPLE_ALGOS_ROTATION_ROBUST = ["sift", "sift+lightglue"]


def download_example_images(repo_id, output_dir):
    """Reference parity: ui/utils.py:142-153 (HF datasets download)."""
    from datasets import load_dataset  # optional dependency

    logger.info(f"Download example dataset from huggingface: {repo_id}")
    dataset = load_dataset(repo_id)
    Path(output_dir).mkdir(parents=True, exist_ok=True)
    for example in dataset["train"]:
        file_path = example["path"]
        image = example["image"]
        full_path = Path(output_dir) / file_path
        full_path.parent.mkdir(parents=True, exist_ok=True)
        image.save(full_path)
    logger.info(f"Images saved to {output_dir} successfully.")
    return Path(output_dir)


def rotate_image(input_path, degrees, output_path):
    """Reference parity: ui/utils.py rotate_image."""
    import PIL.Image

    img = PIL.Image.open(input_path)
    img.rotate(-degrees).save(output_path)


def scale_image(input_path, scale_factor, output_path):
    """Reference parity: ui/utils.py scale_image — rescale into a
    same-size black canvas."""
    import PIL.Image

    img = PIL.Image.open(input_path)
    width, height = img.size
    nw, nh = int(width * scale_factor), int(height * scale_factor)
    canvas = PIL.Image.new("RGB", (width, height), (0, 0, 0))
    canvas.paste(img.resize((nw, nh)),
                 ((width - nw) // 2, (height - nh) // 2))
    canvas.save(output_path)


def _distribute(pairs, algos, rng):
    algos = list(algos)
    out = []
    for i, p in enumerate(pairs):
        out.append(list(p) + [algos[i % len(algos)]])
    rng.shuffle(out)
    return out


def gen_examples(data_root):
    """Build the example gallery entries (reference parity:
    ui/utils.py:156-310). Offline-safe: when neither local data nor the HF
    dataset is reachable, synthesises a rotation/scale pair set from the
    bundled test images."""
    rng = random.Random(1)
    data_root = Path(data_root)
    mapping = data_root / "sacre_coeur" / "mapping"
    if not mapping.exists():
        try:
            download_example_images(DATASETS_REPO_ID, data_root)
        except Exception as e:
            logger.warning(f"example dataset unavailable offline: {e}")
    if not mapping.exists():
        return _gen_synthetic_examples(data_root, rng)

    images = sorted(str(p) for p in mapping.glob("*.jpg"))
    pairs = list(combinations(images, 2))
    rng.shuffle(pairs)
    examples = _distribute(pairs[:5], EXAMPLE_ALGOS, rng)

    # rotation pairs
    rot_dir = data_root / "sacre_coeur" / "rotation"
    rot_dir.mkdir(exist_ok=True, parents=True)
    rot_pairs = []
    for deg in (45, 90, 135, 180, 225, 270, 315):
        out = rot_dir / f"rot{deg}.jpg"
        if not out.exists():
            rotate_image(images[0], deg, out)
        rot_pairs.append((images[0], str(out)))
    examples += _distribute(rot_pairs, EXAMPLE_ALGOS_ROTATION_ROBUST, rng)

    # scale pairs
    scale_dir = data_root / "sacre_coeur" / "scale"
    scale_dir.mkdir(exist_ok=True, parents=True)
    scale_pairs = []
    for s in (0.3, 0.5):
        out = scale_dir / f"scale{s}.jpg"
        if not out.exists():
            scale_image(images[0], s, out)
        scale_pairs.append((images[0], str(out)))
    examples += _distribute(scale_pairs, EXAMPLE_ALGOS_ROTATION_ROBUST, rng)
    return examples


def _gen_synthetic_examples(data_root, rng):
    """Offline fallback: build pairs from the repository test images."""
    src = Path("/root/reference/tests/data")
    imgs = sorted(str(p) for p in src.glob("*.jpg")) if src.exists() else []
    if len(imgs) < 2:
        return []
    data_root.mkdir(parents=True, exist_ok=True)
    pairs = [(imgs[0], imgs[1])]
    for deg in (45, 90, 180):
        out = data_root / f"rot{deg}.jpg"
        if not out.exists():
            img = cv2.imread(imgs[0])
            m = cv2.getRotationMatrix2D(
                (img.shape[1] / 2, img.shape[0] / 2), deg, 1.0)
            cv2.imwrite(str(out),
                        cv2.warpAffine(img, m,
                                       (img.shape[1], img.shape[0])))
        pairs.append((imgs[0], str(out)))
    return _distribute(pairs, EXAMPLE_ALGOS, rng)
