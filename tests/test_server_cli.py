"""HTTP service + CLI smoke tests (reference pattern:
tests/test_cli_app.py — version, config resolution, endpoint round trips).
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

IMG0 = "/root/reference/tests/data/02928139_3448003521.jpg"
IMG1 = "/root/reference/tests/data/17295357_9106075285.jpg"


@pytest.fixture(scope="module")
def server():
    from imcui_tpu.api.server import MatchingService, serve_stdlib

    conf = {
        "feature": {
            "output": "f",
            "model": {"name": "superpoint", "max_keypoints": 256,
                      "keypoint_threshold": 1e-4},
            "preprocessing": {"grayscale": True, "resize_max": 256,
                              "dfactor": 8},
        },
        "matcher": {"output": "m",
                    "model": {"name": "nearest_neighbor",
                              "do_mutual_check": True}},
        "dense": False,
        "standalone": False,
        "ransac": {"enable": True, "method": "TPU_LORANSAC",
                   "reproj_threshold": 8, "confidence": 0.9999,
                   "max_iter": 10000},
    }
    service = MatchingService(conf)
    httpd = serve_stdlib(service, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def test_version_endpoint(server):
    from imcui_tpu import __version__

    with urllib.request.urlopen(f"{server}/version") as resp:
        data = json.loads(resp.read())
    assert data["version"] == __version__


def test_root_and_404(server):
    with urllib.request.urlopen(f"{server}/") as resp:
        assert json.loads(resp.read())["message"] == "OK"
    try:
        urllib.request.urlopen(f"{server}/nope")
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_match_endpoint_json(server):
    from imcui_tpu.api.client import send_request_match

    pred = send_request_match(IMG0, IMG1, base_url=server)
    assert "mkeypoints0_orig" in pred
    assert "mmkeypoints0_orig" in pred
    assert "image0_orig" not in pred  # skipped in the response


def test_extract_endpoint(server):
    from imcui_tpu.api.client import send_request_extract

    preds = send_request_extract(IMG0, base_url=server, binarize=True,
                                 max_keypoints=128)
    assert len(preds) == 1
    kp = np.asarray(preds[0]["keypoints"])
    assert kp.ndim == 2 and kp.shape[1] == 2
    assert "keypoints_orig" in preds[0]


def test_malformed_request_returns_500(server):
    req = urllib.request.Request(
        f"{server}/v1/match", data=b'{"bad": 1}',
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected 500"
    except urllib.error.HTTPError as e:
        assert e.code == 500
        assert "detail" in json.loads(e.read())


def test_cli_version():
    from click.testing import CliRunner

    from imcui_tpu import __version__
    from imcui_tpu.cli.main import cli

    result = CliRunner().invoke(cli, ["--version"])
    assert result.exit_code == 0
    assert __version__ in result.output


def test_cli_config_resolution(tmp_path, monkeypatch):
    from imcui_tpu.cli.main import get_default_config_path

    # package default resolves
    path = get_default_config_path()
    assert path.exists()
    # cwd app.yaml wins
    monkeypatch.chdir(tmp_path)
    (tmp_path / "app.yaml").write_text("server: {name: x, port: 1}\n")
    assert get_default_config_path() == tmp_path / "app.yaml"


def test_app_config_schema():
    from imcui_tpu.ui.utils import get_matcher_zoo, load_config

    cfg = load_config("/root/repo/config/app.yaml")
    assert "matcher_zoo" in cfg and "defaults" in cfg and "server" in cfg
    zoo = get_matcher_zoo(cfg["matcher_zoo"])
    assert "superpoint+lightglue" in zoo
    entry = zoo["superpoint+lightglue"]
    assert entry["matcher"]["model"]["name"] == "lightglue"
    assert entry["feature"]["model"]["name"] == "superpoint"
    # dense standalone entries resolve without a feature conf
    assert zoo["loftr"]["dense"] and zoo["loftr"]["standalone"]
    assert zoo["loftr"]["matcher"]["model"]["name"] == "loftr"


def test_app_class_headless():
    """ImageMatchingApp logic is constructible without gradio."""
    from imcui_tpu.ui.app_class import ImageMatchingApp

    app = ImageMatchingApp(config="/root/repo/config/app.yaml")
    table = app.display_supported_algorithms()
    assert any(row[0] == "superpoint+lightglue" for row in table)


def test_cli_train_group_registered():
    """The train subcommand group (beyond-reference) is wired with both
    trainers and forwards options to imcui_tpu.train.drivers."""
    from click.testing import CliRunner

    from imcui_tpu.cli.main import cli

    res = CliRunner().invoke(cli, ["train", "--help"])
    assert res.exit_code == 0
    assert "lightglue" in res.output and "superpoint" in res.output
    res = CliRunner().invoke(cli, ["train", "lightglue", "--help"])
    assert res.exit_code == 0
    assert "--model-parallel" in res.output

    from imcui_tpu.train import drivers

    assert callable(drivers.train_lightglue)
    assert callable(drivers.train_superpoint)
