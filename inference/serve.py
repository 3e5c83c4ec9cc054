"""Resident inference server: video -> 4D over HTTP.

Process-per-request pays 60-180 s of XLA cache deserialization + weight
upload through the host<->TPU link before any work happens (BENCH_NOTES.md,
"fresh-process overhead diagnosis"); the deployment model is therefore a
resident process with warm compiled programs. This server keeps one
ActionMeshPipeline loaded (optionally sharded over a multi-chip mesh via
``device_mesh="auto"``) and serves requests sequentially — the device runs
one program at a time, so a lock, not a pool, is the right concurrency
model.

The reference has no serving layer (its HF demo drives the pipeline
in-process the same way); endpoints mirror the CLI surface
(inference/video_to_animated_mesh.py):

  GET  /healthz          -> {"status": "ok", "backend": ..., "requests": N}
  POST /v1/video_to_4d   -> run the pipeline
       body: {"input": <path>, "output_dir": <path>, "seed": 44,
              "stage_0_steps"/"stage_1_steps"/"guidance_scales"/
              "face_decimation"/"floaters_threshold"/"anchor_idx": optional,
              "max_frames": 31, "save_animated_glb": true,
              "render": false}

Usage: python inference/serve.py [--port 8080] [--config actionmesh]
       [--weights_dir pretrained_weights] [--prewarm <frames_dir>]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logger = logging.getLogger("actionmesh_tpu.serve")

OVERRIDE_KEYS = (
    "stage_0_steps",
    "stage_1_steps",
    "guidance_scales",
    "face_decimation",
    "floaters_threshold",
    "anchor_idx",
)


class ActionMeshServer:
    """Holds the resident pipeline and serializes device access."""

    def __init__(self, pipeline):
        self.pipeline = pipeline
        self.lock = threading.Lock()
        self.requests_served = 0

    def handle(self, req: dict) -> dict:
        from actionmesh_tpu.io.mesh_io import save_deformation, save_meshes
        from actionmesh_tpu.io.video_input import load_frames

        input_path = req.get("input")
        if not input_path:
            raise ValueError("missing required field: input")
        output_dir = Path(req.get("output_dir", "outputs/serve"))
        output_dir.mkdir(parents=True, exist_ok=True)

        inp = load_frames(
            input_path, max_frames=int(req.get("max_frames", 31))
        )
        overrides = {
            k: req[k] for k in OVERRIDE_KEYS if req.get(k) is not None
        }

        t0 = time.perf_counter()
        with self.lock:  # one device program at a time
            meshes = self.pipeline(
                inp, seed=int(req.get("seed", 44)), **overrides
            )
            self.requests_served += 1
        gen_s = time.perf_counter() - t0

        save_meshes(meshes, output_dir=str(output_dir))
        vertices_path, faces_path = save_deformation(
            meshes, path=output_dir / "deformations"
        )
        artifacts = {
            "meshes": [str(output_dir / f"mesh_{i:02d}.glb") for i in range(len(meshes))],
            "deformation_vertices": str(vertices_path),
            "deformation_faces": str(faces_path),
        }
        if req.get("save_animated_glb", True):
            import numpy as np

            from actionmesh_tpu.io.animated_glb import create_animated_glb_native

            glb_path = output_dir / "animated_mesh.glb"
            create_animated_glb_native(
                vertices=np.load(vertices_path),
                faces=np.load(faces_path),
                output_glb=glb_path,
            )
            artifacts["animated_glb"] = str(glb_path)
        if req.get("render", False):
            from actionmesh_tpu.render.visualizer import ActionMeshVisualizer

            out = ActionMeshVisualizer().render(
                meshes, output_dir=output_dir, input_frames=inp.frames
            )
            artifacts["preview"] = str(out)

        return {
            "status": "ok",
            "n_frames": len(meshes),
            "generation_seconds": round(gen_s, 2),
            "artifacts": artifacts,
        }


def make_handler(server: ActionMeshServer):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path == "/healthz":
                import jax

                self._send(200, {
                    "status": "ok",
                    "backend": jax.default_backend(),
                    "n_devices": len(jax.devices()),
                    "sharded": server.pipeline.device_mesh is not None,
                    "requests": server.requests_served,
                })
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/v1/video_to_4d":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                self._send(200, server.handle(req))
            except (ValueError, FileNotFoundError) as e:
                # input-validation errors (ValueError from ActionMeshInput /
                # load_frames / request parsing) are client errors; internal
                # AssertionErrors deliberately fall through to the 500 path
                # below so invariant violations are logged, not masked as
                # bad requests (r5 code-review finding)
                self._send(400, {"status": "error", "error": str(e)})
            except Exception as e:  # keep the server alive on request failure
                logger.exception("request failed")
                self._send(500, {"status": "error", "error": str(e)})

        def log_message(self, fmt, *args):
            logger.info("%s - %s", self.address_string(), fmt % args)

    return Handler


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--config", type=str, default="actionmesh")
    ap.add_argument("--weights_dir", type=str, default="pretrained_weights")
    ap.add_argument(
        "--dtype", type=str, default="bfloat16",
        choices=["bfloat16", "float16", "float32"],
    )
    ap.add_argument(
        "--prewarm", type=str, default=None,
        help="frames dir to run once at startup so the first request is warm",
    )
    args = ap.parse_args()

    import jax.numpy as jnp

    from actionmesh_tpu.pipeline import ActionMeshPipeline

    dtype = {
        "bfloat16": jnp.bfloat16,
        "float16": jnp.float16,
        "float32": jnp.float32,
    }[args.dtype]
    pipe = ActionMeshPipeline(
        config_name=args.config, weights_dir=args.weights_dir, dtype=dtype
    )
    server = ActionMeshServer(pipe)

    if args.prewarm:
        from actionmesh_tpu.io.video_input import load_frames

        logger.info("Prewarming on %s ...", args.prewarm)
        t0 = time.perf_counter()
        pipe(load_frames(args.prewarm, max_frames=16), seed=0)
        logger.info("Prewarm done in %.0f s", time.perf_counter() - t0)

    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(server))
    logger.info("Serving on http://%s:%d", args.host, args.port)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
