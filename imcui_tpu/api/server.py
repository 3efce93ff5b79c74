"""HTTP matching service (reference contract: imcui/api/server.py:61-179 —
same endpoints GET /, GET /version, POST /v1/match (multipart),
POST /v1/extract (JSON base64 batch), same response shapes).

TPU-first serving design (SURVEY §2.9): the reference scales out with 4
Ray-Serve replica processes × 1 GPU (imcui/config/api.yaml:2-5). On TPU the
analog is ONE process with the pair batch sharded over the chip mesh
(parallel/mesh.py) — models are compiled once and requests are
micro-batched onto the devices; no actor processes, no NCCL.

Transport: FastAPI+uvicorn when installed (reference parity), otherwise a
stdlib ThreadingHTTPServer implementing the same routes — the framework has
zero hard serving dependencies.
"""

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

from .. import __version__, logger
from ..utils.io import read_yaml
from . import ImagesInput, to_base64_nparray
from .core import ImageMatchingAPI

CONF_DIR = Path(__file__).parent.parent / "config"


def load_api_conf(config_path=None):
    path = Path(config_path) if config_path else CONF_DIR / "api.yaml"
    conf = read_yaml(path)
    return conf


class MatchingService:
    """Transport-independent service core (the Ray-Serve deployment body in
    the reference, imcui/api/server.py:61-147)."""

    def __init__(self, conf=None, config_path=None):
        if conf is None:
            conf = load_api_conf(config_path)["api"]
        self.conf = conf
        self.api = ImageMatchingAPI(conf=conf)
        self._lock = threading.Lock()

    def version(self):
        return {"version": __version__}

    def match(self, image0: np.ndarray, image1: np.ndarray):
        """Reference parity: imcui/api/server.py:79-112."""
        with self._lock:
            output = self.api(image0, image1)
        skip_keys = ["image0_orig", "image1_orig"]
        return self.postprocess(output, skip_keys)

    def extract(self, input_images: ImagesInput):
        """Reference parity: imcui/api/server.py:114-147."""
        preds = []
        for i, input_image in enumerate(input_images.data):
            image_array = to_base64_nparray(input_image)
            max_keypoints = (
                input_images.max_keypoints[i]
                if i < len(input_images.max_keypoints) else 512
            )
            with self._lock:
                pred = self.api.extract(
                    image_array,
                    max_keypoints=max_keypoints,
                    binarize=input_images.binarize,
                )
            pred = self.postprocess(pred, ["image", "image_orig"])
            preds.append(pred)
        return preds

    @staticmethod
    def postprocess(output: dict, skip_keys, binarize=True):
        pred = {}
        for key, value in output.items():
            if key in skip_keys:
                continue
            if isinstance(value, np.ndarray):
                pred[key] = value.tolist()
            elif isinstance(value, (int, float, str, list, dict,
                                    type(None))):
                pred[key] = value
        return pred


# ---------------------------------------------------------------------------
# stdlib transport
# ---------------------------------------------------------------------------

def _parse_multipart(handler):
    """Minimal multipart/form-data parser for the /v1/match route."""
    import email
    import email.policy

    ctype = handler.headers.get("Content-Type", "")
    length = int(handler.headers.get("Content-Length", 0))
    body = handler.rfile.read(length)
    msg = email.message_from_bytes(
        b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + body,
        policy=email.policy.HTTP,
    )
    files = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        files[name] = part.get_payload(decode=True)
    return files


def _decode_image_bytes(data: bytes) -> np.ndarray:
    import PIL.Image

    img = PIL.Image.open(io.BytesIO(data)).convert("RGB")
    return np.array(img)


class _Handler(BaseHTTPRequestHandler):
    service: MatchingService = None

    def _send(self, code, payload):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):
        logger.info("HTTP " + fmt % args)

    def do_GET(self):
        if self.path == "/":
            self._send(200, {"message": "OK"})
        elif self.path == "/version":
            self._send(200, self.service.version())
        else:
            self._send(404, {"detail": "Not found"})

    def do_POST(self):
        try:
            if self.path == "/v1/match":
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("multipart/"):
                    files = _parse_multipart(self)
                    image0 = _decode_image_bytes(files["image0"])
                    image1 = _decode_image_bytes(files["image1"])
                else:  # JSON base64 fallback
                    length = int(self.headers.get("Content-Length", 0))
                    data = json.loads(self.rfile.read(length))
                    image0 = to_base64_nparray(data["image0"])
                    image1 = to_base64_nparray(data["image1"])
                self._send(200, self.service.match(image0, image1))
            elif self.path == "/v1/extract":
                length = int(self.headers.get("Content-Length", 0))
                data = json.loads(self.rfile.read(length))
                inp = ImagesInput(**data)
                self._send(200, self.service.extract(inp))
            else:
                self._send(404, {"detail": "Not found"})
        except Exception as e:  # reference returns a 500 JSON envelope
            logger.exception("request failed")
            self._send(500, {"detail": str(e)})


def serve_stdlib(service, host="0.0.0.0", port=8001):
    handler = type("Handler", (_Handler,), {"service": service})
    httpd = ThreadingHTTPServer((host, port), handler)
    logger.info(f"Serving (stdlib) on http://{host}:{port}")
    return httpd


# ---------------------------------------------------------------------------
# FastAPI transport (optional, reference parity)
# ---------------------------------------------------------------------------

def build_fastapi_app(service):
    from fastapi import FastAPI, File, UploadFile
    from fastapi.responses import JSONResponse

    app = FastAPI(name="ImageMatchingService")

    @app.get("/")
    async def root():
        return {"message": "OK"}

    @app.get("/version")
    async def version():
        return service.version()

    @app.post("/v1/match")
    async def match(image0: UploadFile = File(...),
                    image1: UploadFile = File(...)):
        try:
            img0 = _decode_image_bytes(await image0.read())
            img1 = _decode_image_bytes(await image1.read())
            return JSONResponse(content=service.match(img0, img1))
        except Exception as e:
            return JSONResponse(content={"detail": str(e)}, status_code=500)

    @app.post("/v1/extract")
    async def extract(input_images: ImagesInput):
        try:
            return JSONResponse(content=service.extract(input_images))
        except Exception as e:
            return JSONResponse(content={"detail": str(e)}, status_code=500)

    return app


def main(config_path=None, host=None, port=None, block=True):
    conf = load_api_conf(config_path)
    service = MatchingService(conf["api"])
    host = host or conf.get("service", {}).get("host", "0.0.0.0")
    port = port or int(conf.get("service", {}).get("http_port", 8001))
    try:
        import uvicorn

        app = build_fastapi_app(service)
        logger.info(f"Serving (fastapi) on http://{host}:{port}")
        uvicorn.run(app, host=host, port=port)
    except ImportError:
        httpd = serve_stdlib(service, host, port)
        if block:
            httpd.serve_forever()
        return httpd


if __name__ == "__main__":
    main()
