"""Host-side image loading + preprocessing.

Behavior-compatible with the reference's preprocessing (reference:
imcui/hloc/extract_features.py:26-40 resize_image,
imcui/hloc/extract_features.py:106-170 extract-preprocess,
imcui/hloc/match_dense.py:588-640 dense-preprocess), with one TPU-first
addition: **shape bucketing**. XLA compiles one executable per static shape,
so after the reference-equivalent resize we optionally pad the image up to a
bucketed (H, W) and carry a validity size; keypoints are later rescaled with
the reference's ``(kp + 0.5) * scale - 0.5`` convention
(reference: imcui/hloc/match_features.py:189-201).
"""

from pathlib import Path
from types import SimpleNamespace

import cv2
import numpy as np

# Default shape buckets (H, W) — multiples of 64 keep every backbone stride
# (8/16/32) and TPU lane tiling happy. An input resized to 1024 max-edge
# always lands in one of these, so the jit cache stays small and warm.
DEFAULT_BUCKETS = (256, 320, 384, 448, 512, 640, 768, 896, 1024, 1152, 1280, 1536, 2048)


def read_image(path, grayscale=False):
    """Read an image as RGB float or grayscale (reference parity:
    imcui/hloc/utils/io.py:11-24 — cv2 BGR→RGB)."""
    mode = cv2.IMREAD_GRAYSCALE if grayscale else cv2.IMREAD_COLOR
    image = cv2.imread(str(path), mode)
    if image is None:
        raise ValueError(f"Cannot read image {path}.")
    if not grayscale and len(image.shape) == 3:
        image = image[:, :, ::-1]  # BGR to RGB
    return image


def resize_image(image, size, interp="cv2_area"):
    """Resize with cv2/PIL interps by name (reference parity:
    imcui/hloc/extract_features.py:26-40)."""
    if interp.startswith("cv2_"):
        flag = getattr(cv2, "INTER_" + interp[len("cv2_"):].upper())
        h, w = image.shape[:2]
        if flag == cv2.INTER_AREA and (w < size[0] or h < size[1]):
            flag = cv2.INTER_LINEAR
        return cv2.resize(image, size, interpolation=flag)
    elif interp.startswith("pil_"):
        import PIL.Image

        flag = getattr(PIL.Image, interp[len("pil_"):].upper())
        out = PIL.Image.fromarray(image.astype(np.uint8))
        out = out.resize(size, resample=flag)
        return np.asarray(out, dtype=image.dtype)
    raise ValueError(f"Unknown interpolation {interp}.")


def to_grayscale(image):
    if image.ndim == 3 and image.shape[2] == 3:
        return cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
    return image


def bucket_size(h, w, buckets=DEFAULT_BUCKETS):
    """Smallest bucket ≥ each dim; falls back to next multiple of 128."""

    def up(x):
        for b in buckets:
            if b >= x:
                return b
        return int(-(-x // 128) * 128)

    return up(h), up(w)


def preprocess(
    image,
    grayscale=True,
    resize_max=1024,
    force_resize=False,
    width=640,
    height=480,
    dfactor=8,
    interpolation="cv2_area",
    pad_to_bucket=True,
    buckets=DEFAULT_BUCKETS,
):
    """Reference-equivalent preprocess returning fixed-shape inputs.

    Mirrors imcui/hloc/extract_features.py:120-156: optional grayscale,
    downscale so max edge == resize_max (only when scale < 1), optional
    force_resize to (width, height), floor to a multiple of ``dfactor``.
    Then (TPU addition) zero-pad bottom/right up to a shape bucket.

    Returns a dict:
      image: (1, C, Hb, Wb) float32 in [0, 1], zero-padded
      size: (2,) int — valid (w, h) inside the padded canvas
      original_size: (2,) int — (w, h) of the input image
      scale: (2,) float — original / valid, for keypoint rescaling
    """
    image = np.asarray(image)
    if grayscale:
        image = to_grayscale(image)
    image = image.astype(np.float32, copy=False)
    size = np.array(image.shape[:2][::-1])  # (w, h)

    if resize_max:
        s = resize_max / max(size)
        if s < 1.0:
            size_new = tuple(int(round(x * s)) for x in size)
            image = resize_image(image, size_new, interpolation)
    if force_resize:
        image = resize_image(image, (width, height), interpolation)

    # floor to dfactor multiple (reference: extract_features.py:142-149 uses
    # an antialiased resize; we resize too, for parity of pixel content)
    h, w = image.shape[:2]
    h_new, w_new = (h // dfactor) * dfactor, (w // dfactor) * dfactor
    if (h_new, w_new) != (h, w):
        image = resize_image(image, (w_new, h_new), "cv2_area")
        h, w = h_new, w_new

    if image.ndim == 2:
        image = image[None]  # 1xHxW
    else:
        image = image.transpose(2, 0, 1)  # CxHxW
    image = image / 255.0

    valid = np.array([w, h])
    if pad_to_bucket:
        hb, wb = bucket_size(h, w, buckets)
        if (hb, wb) != (h, w):
            pad = np.zeros((image.shape[0], hb, wb), np.float32)
            pad[:, :h, :w] = image
            image = pad
    return {
        "image": image[None].astype(np.float32),
        "size": valid,
        "original_size": size,
        "scale": size.astype(np.float64) / valid,
    }


def scale_keypoints(kpts, scale):
    """Rescale (..., 2) xy keypoints by per-axis scale (reference parity:
    imcui/hloc/match_features.py:189-201)."""
    return np.asarray(kpts) * np.asarray(scale)


def keypoints_to_original(kpts, scale):
    """Map model-resolution keypoints back to original resolution with the
    half-pixel-center convention (reference:
    imcui/hloc/extract_features.py:232-235 ``(kp + .5) * scale - .5``)."""
    return (np.asarray(kpts) + 0.5) * np.asarray(scale) - 0.5


def load_conf(conf):
    """dict → attribute namespace with preprocess defaults applied."""
    defaults = {
        "grayscale": True,
        "resize_max": 1024,
        "force_resize": False,
        "width": 640,
        "height": 480,
        "dfactor": 8,
        "interpolation": "cv2_area",
    }
    return SimpleNamespace(**{**defaults, **(conf or {})})
