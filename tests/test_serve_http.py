"""HTTP serving front-end (stcat_tpu/cli/serve.py).

In-process server on an ephemeral port, driven with stdlib http.client:
health endpoint, npz predict round-trip (boxes for every frame id, valid
span), custom frame ids, concurrent requests through the micro-batcher,
and error paths (malformed body, bad frame rank, unknown path) must map to
HTTP codes without killing the server.
"""

import http.client
import io
import json
import threading

import numpy as np
import pytest

# whole module: the predictor fixture jits the tiny model (~30 s on the
# 1-core CI host); fast-gate budget (verdict r5 task 3)
pytestmark = pytest.mark.slow

from helpers import tiny_cfg
from stcat_tpu.cli.serve import build_server


@pytest.fixture(scope="module")
def server():
    cfg = tiny_cfg([
        "INPUT.RESOLUTION", 64,
        "INPUT.MAX_QUERY_LEN", 8,
        "TPU.FRAME_BUCKETS", "[8]",
    ])
    srv, batcher = build_server(
        cfg, "127.0.0.1", 0, max_batch=2, max_wait_ms=10.0
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv.server_address
    srv.shutdown()
    batcher.close()
    srv.server_close()


def _post(addr, body, path="/predict"):
    conn = http.client.HTTPConnection(*addr, timeout=300)
    conn.request("POST", path, body)
    resp = conn.getresponse()
    out = resp.status, json.loads(resp.read())
    conn.close()
    return out


def _npz(frames, text, frame_ids=None):
    buf = io.BytesIO()
    arrays = {"frames": frames, "text": np.array(text)}
    if frame_ids is not None:
        arrays["frame_ids"] = np.asarray(frame_ids)
    np.savez(buf, **arrays)
    return buf.getvalue()


def _clip(t=12, seed=0):
    return np.random.RandomState(seed).randint(
        0, 255, size=(t, 48, 64, 3), dtype=np.uint8
    )


def test_healthz(server):
    conn = http.client.HTTPConnection(*server, timeout=60)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    assert resp.status == 200
    assert body["status"] == "ok"
    assert body["frame_buckets"] == [8]


def test_predict_roundtrip(server):
    status, body = _post(server, _npz(_clip(), "a person waves"))
    assert status == 200, body
    assert sorted(int(k) for k in body["boxes"]) == list(range(12))
    s, e = body["span"]
    assert 0 <= s < e <= 12
    for box in body["boxes"].values():
        assert len(box) == 4 and all(np.isfinite(box))


def test_predict_custom_frame_ids(server):
    fids = [3, 5, 7, 9, 11, 13, 15, 17]
    status, body = _post(server, _npz(_clip(t=8), "sparse ids", fids))
    assert status == 200, body
    assert sorted(int(k) for k in body["boxes"]) == list(range(3, 18))


def test_predict_concurrent(server):
    results = {}

    def call(i):
        results[i] = _post(server, _npz(_clip(seed=i), f"request {i}"))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 4
    for status, body in results.values():
        assert status == 200, body
        assert len(body["boxes"]) == 12


def test_bad_body_is_400(server):
    status, body = _post(server, b"this is not an npz archive")
    assert status == 400
    assert "bad request body" in body["error"]


def test_bad_rank_is_400(server):
    status, body = _post(server, _npz(np.zeros((4, 8, 8), np.uint8), "3d"))
    assert status == 400
    assert "frames must be" in body["error"]


def test_unknown_path_is_404(server):
    status, body = _post(server, b"", path="/nope")
    assert status == 404
