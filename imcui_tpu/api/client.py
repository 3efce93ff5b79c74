"""HTTP API client (reference contract: imcui/api/client.py:23-180 — same
functions send_request_match / send_request_extract / get_api_version, same
b64 encoding; stdlib urllib instead of requests so it runs everywhere).
"""

import base64
import json
import os
import pickle
import urllib.request
from pathlib import Path

import cv2
import numpy as np

API_VERSION_URL = "{}/version"
API_URL_MATCH = "{}/v1/match"
API_URL_EXTRACT = "{}/v1/extract"

BASE_URL = os.environ.get("REMOTE_URL_RAILWAY", "http://127.0.0.1:8001")


def _post_json(url, payload, timeout=120):
    data = json.dumps(payload).encode()
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def _get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        return json.loads(resp.read())


def read_image_to_base64(path):
    """PNG-base64 encode an image file (reference parity:
    imcui/api/client.py)."""
    img = cv2.imread(str(path))
    if img is None:
        raise ValueError(f"Cannot read image {path}")
    ok, buf = cv2.imencode(".png", img)
    assert ok
    return base64.b64encode(buf.tobytes()).decode("utf-8")


def get_api_version(base_url=BASE_URL):
    return _get(API_VERSION_URL.format(base_url))


def send_request_match(path0, path1, base_url=BASE_URL):
    """Match two images via the JSON-base64 route. Returns the pred dict
    with lists converted back to ndarrays."""
    payload = {
        "image0": read_image_to_base64(path0),
        "image1": read_image_to_base64(path1),
    }
    out = _post_json(API_URL_MATCH.format(base_url), payload)
    for k, v in out.items():
        if isinstance(v, list):
            try:
                out[k] = np.array(v)
            except ValueError:
                pass
    return out


def send_request_extract(image_path, base_url=BASE_URL, binarize=False,
                         max_keypoints=1024):
    """Extract features from one or more images (reference parity:
    imcui/api/client.py send_request_extract)."""
    if isinstance(image_path, (str, Path)):
        paths = [image_path]
    else:
        paths = list(image_path)
    payload = {
        "data": [read_image_to_base64(p) for p in paths],
        "max_keypoints": [max_keypoints] * len(paths),
        "timestamps": [str(i) for i in range(len(paths))],
        "grayscale": False,
        "binarize": binarize,
    }
    preds = _post_json(API_URL_EXTRACT.format(base_url), payload)
    for pred in preds:
        for k, v in pred.items():
            if isinstance(v, list):
                try:
                    pred[k] = np.array(v)
                except ValueError:
                    pass
    return preds


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--image0", type=str, required=True)
    parser.add_argument("--image1", type=str, required=True)
    parser.add_argument("--url", type=str, default=BASE_URL)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()
    print(get_api_version(args.url))
    pred = send_request_match(args.image0, args.image1, args.url)
    print({k: getattr(v, "shape", v) for k, v in pred.items()})
    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(pred, f)
