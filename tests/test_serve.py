"""Resident HTTP server (inference/serve.py) end-to-end on the tiny model."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tests.test_pipeline import tiny_pipeline, make_frames  # noqa: F401


@pytest.fixture(scope="module")
def server(tiny_pipeline, tmp_path_factory):  # noqa: F811
    from inference.serve import ActionMeshServer, make_handler

    srv = ActionMeshServer(tiny_pipeline)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz") as r:
        body = json.loads(r.read())
    assert r.status == 200 and body["status"] == "ok"
    assert body["n_devices"] >= 1


def test_video_to_4d_request(server, tmp_path):
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i, img in enumerate(make_frames(16, seed=7)):
        img.save(frames_dir / f"{i:02d}.png")

    out_dir = tmp_path / "out"
    status, body = _post(
        f"{server}/v1/video_to_4d",
        {"input": str(frames_dir), "output_dir": str(out_dir), "seed": 44},
    )
    assert status == 200, body
    assert body["status"] == "ok" and body["n_frames"] == 16
    v = np.load(body["artifacts"]["deformation_vertices"])
    assert v.shape[0] == 16 and np.isfinite(v).all()
    assert (out_dir / "animated_mesh.glb").exists()

    # health reflects the served request
    with urllib.request.urlopen(f"{server}/healthz") as r:
        assert json.loads(r.read())["requests"] == 1


def test_bad_request_is_400_and_server_survives(server):
    status, body = _post(f"{server}/v1/video_to_4d", {})
    assert status == 400 and body["status"] == "error"
    status, body = _post(
        f"{server}/v1/video_to_4d", {"input": "/nonexistent/frames"}
    )
    assert status == 400 and body["status"] == "error"
    with urllib.request.urlopen(f"{server}/healthz") as r:
        assert r.status == 200
