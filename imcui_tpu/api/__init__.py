"""HTTP API package (reference contract: imcui/api/__init__.py).

Request schema mirrors the reference's pydantic ``ImagesInput``
(imcui/api/__init__.py:14-25) plus the b64 helpers.
"""

import base64
import io
from typing import List, Optional

import numpy as np
from pydantic import BaseModel


class ImagesInput(BaseModel):
    data: List[str] = []
    max_keypoints: List[int] = []
    timestamps: List[str] = []
    grayscale: bool = False
    image_hw: List[List[int]] = [[], []]
    feature_type: int = 0
    rotates: List[float] = []
    scales: List[float] = []
    reference_points: List[List[float]] = []
    binarize: bool = False


def decode_base64_to_image(encoding: str) -> np.ndarray:
    """base64 → RGB ndarray (reference parity: imcui/api/__init__.py)."""
    import PIL.Image

    if encoding.startswith("data:image/"):
        encoding = encoding.split(";")[1].split(",")[1]
    image = PIL.Image.open(io.BytesIO(base64.b64decode(encoding)))
    return np.array(image.convert("RGB"))


def to_base64_nparray(encoding: str) -> np.ndarray:
    return np.array(decode_base64_to_image(encoding)).astype("uint8")
