"""Serving CLI: an HTTP front-end over GroundingPredictor + MicroBatcher.

The reference's only inference surface is the batch eval script
(ref scripts/test_net.py); this is the deployment shape it lacks: one
long-lived process per chip that compiles at warmup, holds the weights on
device, and micro-batches concurrent requests.

    python -m stcat_tpu.cli.serve --config-file experiments/VidSTG/stcat.yaml \
        --port 8765 MODEL.WEIGHT out/checkpoints

Protocol (stdlib-only on both ends):
  GET  /healthz           -> {"status": "ok", "model": ..., "resolution": ...}
  POST /predict           body: an .npz archive (numpy.savez) with
       frames     uint8 [T, H, W, 3] RGB            (required)
       text       0-d unicode array, the query      (required)
       frame_ids  int array [T], original frame ids (optional)
    -> {"boxes": {frame_id: [x1, y1, x2, y2]}, "span": [start, end]}
       boxes in ORIGINAL pixel coordinates, span in frame_ids units.

Client sketch:
    buf = io.BytesIO(); np.savez(buf, frames=clip, text=np.array(query))
    conn = http.client.HTTPConnection(host, port)
    conn.request("POST", "/predict", buf.getvalue())

Concurrency: ThreadingHTTPServer gives one thread per in-flight request;
all of them funnel into the MicroBatcher, which packs up to --max-batch
requests into one stacked device forward (stcat_tpu/serve.py).
"""

from __future__ import annotations

import argparse
import io
import json
import os
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def parse_args():
    p = argparse.ArgumentParser(description="STCAT-TPU serving")
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--max-batch", type=int, default=2,
                   help="device lanes per forward (requests per micro-batch)")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="max time a request waits for lane-mates")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def _make_handler(batcher, info):
    import numpy as np

    class Handler(BaseHTTPRequestHandler):
        # the predictor logs through the framework logger; per-request
        # access lines would swamp it at serving rates
        def log_message(self, fmt, *args):
            pass

        def _reply(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok", **info})
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                with np.load(io.BytesIO(self.rfile.read(n))) as z:
                    frames = z["frames"]
                    text = str(z["text"])
                    fids = z["frame_ids"].tolist() if "frame_ids" in z else None
            except Exception as e:
                self._reply(400, {"error": f"bad request body: {e}"})
                return
            try:
                res = batcher.submit(frames, text, fids).result(timeout=600)
            except ValueError as e:  # input validation from the predictor
                self._reply(400, {"error": str(e)})
                return
            except Exception as e:
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._reply(200, {
                "boxes": {
                    int(fid): [float(v) for v in np.asarray(box).reshape(-1)]
                    for fid, box in res["boxes"].items()
                },
                "span": [int(res["span"][0]), int(res["span"][1])],
            })

    return Handler


def build_server(cfg, host, port, max_batch, max_wait_ms, logger=None):
    """Construct (server, batcher); separated from main() for tests."""
    import numpy as np

    from ..serve import GroundingPredictor, MicroBatcher

    pred = GroundingPredictor(cfg, logger=logger, max_batch=max_batch)
    # warmup: compile the forward for the largest frame bucket so the first
    # real request does not pay the (minutes-scale) jit
    t_max = int(max(cfg.TPU.FRAME_BUCKETS))
    warm = np.zeros((min(2 * t_max, 2 * cfg.INPUT.MAX_VIDEO_LEN), 64, 64, 3),
                    np.uint8)
    pred.predict(warm, "warmup")
    batcher = MicroBatcher(pred, max_wait_ms=max_wait_ms)
    info = {
        "model": cfg.MODEL.VISION_BACKBONE.NAME,
        "resolution": cfg.INPUT.RESOLUTION,
        "max_batch": max_batch,
        "frame_buckets": list(cfg.TPU.FRAME_BUCKETS),
    }
    server = ThreadingHTTPServer((host, port), _make_handler(batcher, info))
    return server, batcher


def main():
    args = parse_args()
    if os.environ.get("JAX_COORDINATOR"):
        import jax

        jax.distributed.initialize()

    from ..config import default_config, merge_from_file, merge_from_list
    from ..core.logging import setup_logger
    from ..core.xla_cache import setup_compile_cache

    cfg = default_config()
    if args.config_file:
        cfg = merge_from_file(cfg, args.config_file)
    if args.opts:
        cfg = merge_from_list(cfg, args.opts)
    setup_compile_cache(cfg)
    logger = setup_logger("stcat_tpu", cfg.OUTPUT_DIR)

    server, batcher = build_server(
        cfg, args.host, args.port, args.max_batch, args.max_wait_ms, logger
    )
    logger.info(f"serving on {args.host}:{server.server_address[1]} "
                f"(max_batch={args.max_batch}, wait={args.max_wait_ms}ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.close()
        server.server_close()


if __name__ == "__main__":
    main()
