"""Serving layer: GroundingPredictor + MicroBatcher (stcat_tpu/serve.py).

The predictor must produce structurally-valid grounding results straight
from raw uint8 frames (the production ingest path: device-side resample /
normalize), honor the two-stream eval protocol (every input frame id gets a
box back after interpolation), keep fixed device shapes across ragged
request sizes, and agree with itself between the single-request and
micro-batched paths (pad lanes and batching must not change row decoding).
"""

import numpy as np
import pytest

# whole module: the predictor fixture jits the tiny model (~30 s on the
# 1-core CI host); fast-gate budget (verdict r5 task 3)
pytestmark = pytest.mark.slow

from helpers import tiny_cfg
from stcat_tpu.serve import GroundingPredictor, MicroBatcher


@pytest.fixture(scope="module")
def predictor():
    cfg = tiny_cfg([
        "INPUT.RESOLUTION", 64,
        "INPUT.MAX_QUERY_LEN", 8,
        "TPU.FRAME_BUCKETS", "[8]",
    ])
    return GroundingPredictor(cfg, max_batch=2)


def _clip(t=12, h=48, w=64, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, size=(t, h, w, 3), dtype=np.uint8)


def _check_result(res, t, h, w):
    assert set(res) == {"boxes", "span"}
    assert sorted(res["boxes"]) == list(range(t)), "interp must fill every fid"
    for fid, box in res["boxes"].items():
        x1, y1, x2, y2 = box
        assert x1 >= 0 and y1 >= 0, (fid, box)  # clamped like the reference
        assert np.isfinite(box).all()
    s, e = res["span"]
    assert 0 <= s < e <= t


def test_predict_single(predictor):
    t, h, w = 12, 48, 64
    res = predictor.predict(_clip(t, h, w), "a person waves at the camera")
    _check_result(res, t, h, w)


def test_predict_batch_matches_single(predictor):
    """Padding lanes (1 real request in a 2-lane batch) and full batches
    (2 real requests) must decode to the same result for the same input."""
    clip_a, clip_b = _clip(seed=1), _clip(seed=2)
    solo = predictor.predict(clip_a, "the red car turns left")
    batched = predictor.predict_batch([
        (clip_a, "the red car turns left", None),
        (clip_b, "a dog jumps", None),
    ])
    assert len(batched) == 2
    np.testing.assert_allclose(
        np.asarray(sorted(solo["boxes"].items()), dtype=object)[0][1],
        np.asarray(sorted(batched[0]["boxes"].items()), dtype=object)[0][1],
    )
    assert solo["span"] == batched[0]["span"]
    for fid in solo["boxes"]:
        np.testing.assert_allclose(
            solo["boxes"][fid], batched[0]["boxes"][fid], rtol=1e-4, atol=1e-4
        )
    _check_result(batched[1], clip_b.shape[0], *clip_b.shape[1:3])


def test_predict_overflow_splits(predictor):
    """More requests than lanes: transparent chunking."""
    reqs = [(_clip(seed=i), f"clip {i}", None) for i in range(3)]
    out = predictor.predict_batch(reqs)
    assert len(out) == 3
    for res in out:
        _check_result(res, 12, 48, 64)


def test_custom_frame_ids(predictor):
    """Sparse frame ids (the 2x-rate sampling case): boxes come back keyed
    by the caller's ids with the gaps interpolated."""
    t = 8
    fids = [3, 5, 7, 9, 11, 13, 15, 17]
    res = predictor.predict(_clip(t), "a child on a bike", frame_ids=fids)
    assert sorted(res["boxes"]) == list(range(3, 18)), "gap fill to full rate"
    s, e = res["span"]
    assert 3 <= s < e <= 18


def test_single_frame_clip(predictor):
    res = predictor.predict(_clip(t=1), "one frame")
    assert sorted(res["boxes"]) == [0]
    assert res["span"] == [0, 1]


def test_micro_batcher_concurrent(predictor):
    import concurrent.futures

    with MicroBatcher(predictor, max_wait_ms=20.0) as mb:
        futs = [
            mb.submit(_clip(seed=10 + i), f"request {i}") for i in range(5)
        ]
        done = concurrent.futures.wait(futs, timeout=300)
        assert not done.not_done
        for f in futs:
            _check_result(f.result(), 12, 48, 64)


def test_micro_batcher_propagates_errors(predictor):
    with MicroBatcher(predictor) as mb:
        bad = mb.submit(np.zeros((4, 8, 8), np.uint8), "not 4d")
        with pytest.raises(ValueError):
            bad.result(timeout=60)
