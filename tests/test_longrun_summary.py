"""scripts/longrun_summary.py: the stability-artifact summarizer.

The summary.json it writes is the committed longevity evidence
(artifacts/longrun_r4), so its resume detection and drift math get pinned
here with synthetic metrics.jsonl fixtures.
"""

import importlib.util
import json
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "longrun_summary",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "longrun_summary.py"),
)
longrun_summary = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(longrun_summary)


def _write(out_dir, rows, log_lines=()):
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "metrics.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    if log_lines:
        with open(os.path.join(out_dir, "log.txt"), "w") as f:
            f.write("\n".join(log_lines) + "\n")


def _row(step, loss=10.0, step_time=0.5, data_time=0.05):
    return {"step": step, "loss": loss, "step_time": step_time,
            "data_time": data_time}


def test_resume_detected_from_step_dip(tmp_path):
    """A resumed process re-logs earlier steps: the dip is only visible in
    FILE order (sorting by step first would erase it)."""
    out, art = str(tmp_path / "out"), str(tmp_path / "art")
    rows = [_row(s) for s in (50, 100, 150)] + [_row(s) for s in (120, 170)]
    _write(out, rows)  # no log.txt: the dip is the only evidence
    s = longrun_summary.summarize(out, art)
    assert s["resume_observed"] is True
    assert s["total_logged_steps"] == 170
    # dedupe keeps one row per step, sorted
    assert s["log_rows"] == 5


def test_no_resume_on_monotonic_steps(tmp_path):
    out, art = str(tmp_path / "out"), str(tmp_path / "art")
    _write(out, [_row(s) for s in (50, 100, 150, 200)])
    s = longrun_summary.summarize(out, art)
    assert s["resume_observed"] is False
    assert s["resume_iteration"] is None


def test_resume_from_log_line_and_drift(tmp_path):
    out, art = str(tmp_path / "out"), str(tmp_path / "art")
    rows = [_row(s, loss=20.0 - s / 100, step_time=0.5 if s <= 400 else 0.4)
            for s in range(50, 850, 50)]
    _write(out, rows, log_lines=["... Resumed from iteration 400"])
    s = longrun_summary.summarize(out, art)
    assert s["resume_observed"] is True
    assert s["resume_iteration"] == 400
    assert s["step_time_drift_frac"] == pytest.approx(0.4 / 0.5 - 1, abs=1e-6)
    assert s["loss_last"] < s["loss_first"]
    # artifacts written
    assert os.path.exists(os.path.join(art, "summary.json"))
    assert os.path.exists(os.path.join(art, "metrics.jsonl"))
