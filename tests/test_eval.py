"""Evaluator + engine tests: hand-computed vIoU values, interp, synthetic e2e."""

import numpy as np
import pytest

from stcat_tpu.data.synthetic import write_synthetic_cache
from stcat_tpu.eval.engine import linear_interp_boxes
from stcat_tpu.eval.evaluator import GroundingEvaluator
from helpers import tiny_cfg


@pytest.fixture()
def hand_evaluator(tmp_path):
    """One video: GT span frames [2, 5], box [0,0,10,10] on all GT frames."""
    import gzip
    import json
    import os

    cache = tmp_path / "data_cache"
    cache.mkdir()
    annos = [
        {
            "item_id": 0,
            "vid": "v0",
            "bboxs": {str(f): [0.0, 0.0, 10.0, 10.0] for f in range(2, 6)},
            "description": "d",
            "qtype": "declar",
            "gt_temp_bound": [2, 5],
        }
    ]
    with gzip.open(cache / "vidstg-test-anno.json.gz", "wt") as f:
        json.dump(annos, f)
    with gzip.open(cache / "vidstg-test-input.json.gz", "wt") as f:
        json.dump([], f)
    return GroundingEvaluator(str(tmp_path), "VidSTG", "test")


class TestEvaluatorMath:
    def test_perfect_prediction(self, hand_evaluator):
        ev = hand_evaluator
        ev.update({0: {f: [[0.0, 0.0, 10.0, 10.0]] for f in range(2, 6)}})
        ev.video_update({0: {"sted": [2, 6], "qtype": "declar"}})
        out = ev.summarize()
        # tIoU: pred [2,6] vs gt [2,5]: inter=3, union=5 -> wait: spans are
        # [start, end): gt span len 3 (2..5 exclusive of end per the math:
        # gt_sted[1]-gt_sted[0]=3), pred len 4, inter=min(5,6)-2=3, union=4
        assert out["declar_tiou"] == pytest.approx(3 / 4)
        # vIoU: frames in inter_predgt = {2,3,4}: 3 perfect IoUs; union span
        # = range(2,6) -> 4 frames
        assert out["declar_viou"] == pytest.approx(3 / 4)
        assert out["declar_gt_viou"] == pytest.approx(1.0)
        assert out["declar_viou@0.5"] == 1.0

    def test_half_overlap_boxes(self, hand_evaluator):
        ev = hand_evaluator
        # shifted boxes: [0,5,10,15] vs [0,0,10,10]: inter 50, union 150
        ev.update({0: {f: [[0.0, 5.0, 10.0, 15.0]] for f in range(2, 6)}})
        ev.video_update({0: {"sted": [2, 5], "qtype": "declar"}})
        out = ev.summarize()
        third = 50 / 150
        assert out["declar_gt_viou"] == pytest.approx(third)
        # inter span {2,3,4}, union span {2,3,4} (3 frames): 3 * 1/3 / 3
        assert out["declar_viou"] == pytest.approx(third)
        assert out["declar_viou@0.5"] == 0.0
        assert out["declar_viou@0.3"] == 1.0

    def test_disjoint_temporal(self, hand_evaluator):
        ev = hand_evaluator
        ev.update({0: {f: [[0.0, 0.0, 10.0, 10.0]] for f in range(2, 6)}})
        ev.video_update({0: {"sted": [6, 9], "qtype": "declar"}})
        out = ev.summarize()
        assert out["declar_tiou"] == 0.0
        assert out["declar_viou"] == 0.0
        assert out["declar_gt_viou"] == pytest.approx(1.0)


def test_linear_interp():
    d = {0: [[0.0, 0.0, 10.0, 10.0]], 4: [[4.0, 8.0, 14.0, 18.0]]}
    out = linear_interp_boxes(d)
    assert sorted(out) == [0, 1, 2, 3, 4]
    np.testing.assert_allclose(out[2][0], [2.0, 4.0, 12.0, 14.0])
    np.testing.assert_allclose(out[3][0], [3.0, 6.0, 13.0, 16.0])


def test_synthetic_cache_roundtrip(tmp_path):
    write_synthetic_cache(str(tmp_path), "VidSTG", "test", n_items=3, n_frames=12)
    ev = GroundingEvaluator(str(tmp_path), "VidSTG", "test")
    assert len(ev.vid2steds) == 3
    # all GT boxes within image bounds
    for vid, boxes in ev.vid2box.items():
        for fid, bb in boxes.items():
            x0, y0, x1, y1 = bb[0]
            assert 0 <= x0 < x1 and 0 <= y0 < y1

class TestHCSTVGEvaluator:
    """HC-STVG aggregates globally (no per-qtype split, evaluator.py:41).

    Same hand-computed geometry as the VidSTG fixture: pred span [2, 6] vs
    gt [2, 5] -> tIoU 3/4; 3 perfect-IoU frames over a 4-frame union span.
    """

    def test_hand_values_no_qtype_split(self, tmp_path):
        import gzip
        import json

        cache = tmp_path / "data_cache"
        cache.mkdir()
        annos = [{
            "item_id": 0,
            "vid": "v0",
            "bboxs": {str(f): [0.0, 0.0, 10.0, 10.0] for f in range(2, 6)},
            "description": "d",
            "gt_temp_bound": [2, 5],
        }]
        with gzip.open(cache / "hcstvg-test-anno.json.gz", "wt") as f:
            json.dump(annos, f)
        with gzip.open(cache / "hcstvg-test-input.json.gz", "wt") as f:
            json.dump([], f)
        ev = GroundingEvaluator(str(tmp_path), "HC-STVG", "test")
        ev.update({0: {f: [[0.0, 0.0, 10.0, 10.0]] for f in range(2, 6)}})
        ev.video_update({0: {"sted": [2, 6]}})
        out = ev.summarize()
        assert set(out) == {"tiou", "viou", "gt_viou",
                            "viou@0.3", "viou@0.5",
                            "gt_viou@0.3", "gt_viou@0.5"}
        assert out["tiou"] == pytest.approx(3 / 4)
        assert out["viou"] == pytest.approx(3 / 4)
        assert out["gt_viou"] == pytest.approx(1.0)
        assert out["viou@0.5"] == 1.0
