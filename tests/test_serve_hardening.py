"""Serve-mode hardening (round-4 verdict item 9): error paths return
structured JSON, a mid-request crash neither kills the server nor leaks
the device lock, and concurrent requests are serialized by that lock.

Fast tier: the pipeline is faked (the device semantics under test —
one program at a time behind ActionMeshServer.lock — do not need real
compute; tests/test_serve.py covers the real tiny pipeline end-to-end).
"""

import json
import threading
import time
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from actionmesh_tpu.models.stage0 import make_uv_sphere
from inference.serve import ActionMeshServer, make_handler


class FakePipeline:
    """Stands in for ActionMeshPipeline: returns n_frames tiny meshes."""

    device_mesh = None

    def __init__(self):
        self.in_flight = 0
        self.max_in_flight = 0
        self.fail_next = None
        self.hold_seconds = 0.0
        self._stat_lock = threading.Lock()

    def __call__(self, inp, seed=44, **overrides):
        with self._stat_lock:
            self.in_flight += 1
            self.max_in_flight = max(self.max_in_flight, self.in_flight)
        try:
            if self.fail_next:
                exc = self.fail_next
                self.fail_next = None
                raise exc
            if self.hold_seconds:
                time.sleep(self.hold_seconds)
            base = make_uv_sphere(n_lat=6, n_lon=8)
            return [base for _ in range(inp.n_frames)]
        finally:
            with self._stat_lock:
                self.in_flight -= 1


@pytest.fixture()
def serve(tmp_path):
    pipe = FakePipeline()
    srv = ActionMeshServer(pipe)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"

    frames = tmp_path / "frames"
    frames.mkdir()
    from PIL import Image

    for i in range(16):  # MIN_FRAMES (io/video_input.py)
        Image.fromarray(
            np.full((8, 8, 4), 128, np.uint8), "RGBA"
        ).save(frames / f"{i:02d}.png")
    yield url, pipe, str(frames), str(tmp_path / "out")
    httpd.shutdown()


def _post_raw(url, data: bytes):
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, payload):
    return _post_raw(url, json.dumps(payload).encode())


def test_malformed_json_body_is_structured_400(serve):
    url, _, _, _ = serve
    status, body = _post_raw(f"{url}/v1/video_to_4d", b"{not json!!")
    assert status == 400
    assert body["status"] == "error" and body["error"]


def test_unknown_paths_are_structured_404(serve):
    url, _, _, _ = serve
    status, body = _post(f"{url}/v1/nope", {})
    assert status == 404 and "unknown path" in body["error"]
    try:
        with urllib.request.urlopen(f"{url}/nope") as r:
            raise AssertionError(f"expected 404, got {r.status}")
    except urllib.error.HTTPError as e:
        assert e.code == 404
        assert "unknown path" in json.loads(e.read())["error"]


def test_invalid_field_type_is_structured_400(serve):
    url, _, frames, out = serve
    status, body = _post(
        f"{url}/v1/video_to_4d",
        {"input": frames, "output_dir": out, "seed": "not-a-number"},
    )
    assert status == 400 and body["status"] == "error"


def test_mid_request_crash_500_then_server_and_lock_recover(serve):
    url, pipe, frames, out = serve
    pipe.fail_next = RuntimeError("device program aborted mid-request")
    status, body = _post(
        f"{url}/v1/video_to_4d", {"input": frames, "output_dir": out}
    )
    assert status == 500
    assert body["status"] == "error"
    assert "aborted mid-request" in body["error"]

    # the crash must not leak the device lock or kill the process: the
    # next request on the SAME server must succeed
    status, body = _post(
        f"{url}/v1/video_to_4d", {"input": frames, "output_dir": out}
    )
    assert status == 200, body
    assert body["status"] == "ok" and body["n_frames"] == 16
    with urllib.request.urlopen(f"{url}/healthz") as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and health["requests"] == 1


def test_concurrent_requests_serialized_by_device_lock(serve):
    url, pipe, frames, out = serve
    pipe.hold_seconds = 0.2  # long enough for requests to overlap if unlocked
    results = []

    def fire(i):
        results.append(
            _post(
                f"{url}/v1/video_to_4d",
                {"input": frames, "output_dir": f"{out}/{i}"},
            )
        )

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert all(status == 200 for status, _ in results), results
    # the device executes one program at a time: the lock must have
    # prevented any concurrent pipeline entry
    assert pipe.max_in_flight == 1
    with urllib.request.urlopen(f"{url}/healthz") as r:
        assert json.loads(r.read())["requests"] == 3


def test_artifacts_written_per_request_output_dir(serve, tmp_path):
    url, _, frames, _ = serve
    out = tmp_path / "req_out"
    status, body = _post(
        f"{url}/v1/video_to_4d",
        {"input": frames, "output_dir": str(out), "save_animated_glb": True},
    )
    assert status == 200, body
    for key in ("meshes", "deformation_vertices", "animated_glb"):
        assert key in body["artifacts"]
    assert (out / "animated_mesh.glb").exists()
    v = np.load(body["artifacts"]["deformation_vertices"])
    assert v.shape[0] == 16 and np.isfinite(v).all()


def test_internal_assertion_is_500_not_400(serve):
    """Internal invariant violations (AssertionError) are server faults:
    they must return 500 with the error logged, never be masked as a 400
    client error (r5 code-review finding). Client input errors raise
    ValueError (io/video_input.py) and keep mapping to 400."""
    url, pipe, frames, out = serve
    pipe.fail_next = AssertionError("bank invariant violated")
    status, body = _post(
        f"{url}/v1/video_to_4d", {"input": frames, "output_dir": out}
    )
    assert status == 500
    assert body["status"] == "error"
    assert "bank invariant violated" in body["error"]

    # server survives and the device lock is released
    status, body = _post(
        f"{url}/v1/video_to_4d", {"input": frames, "output_dir": out}
    )
    assert status == 200, body
