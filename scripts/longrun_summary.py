"""Summarize a long training run's metrics.jsonl into a committed artifact.

    python scripts/longrun_summary.py out/longrun_r4 artifacts/longrun_r4

Copies the raw metrics.jsonl and writes summary.json with the stability
evidence the round-4 verdict asks for (task 5): loss-curve samples, step-time
drift between the first and last quarters of the run (steady-state only --
compile iterations and eval-adjacent stalls are excluded via median), and HBM
occupancy drift from the in-loop memory_stats samples (train/loop.py).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys


def summarize(out_dir: str, artifact_dir: str) -> dict:
    path = os.path.join(out_dir, "metrics.jsonl")
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except ValueError:
                pass  # torn tail write from a preempted process
    if not rows:
        raise SystemExit(f"no rows in {path}")

    # resume evidence: the trainer logs "Resumed from iteration N" on a
    # crash-resume restart (train/loop.py); a step sequence that dips back
    # (re-logging restored iterations) also counts. Checked in FILE order --
    # a dip is invisible once rows are sorted by step.
    resumed = any(b["step"] <= a["step"] for a, b in zip(rows, rows[1:]))
    rows.sort(key=lambda r: r["step"])
    resume_iter = None
    log_path = os.path.join(out_dir, "log.txt")
    if os.path.exists(log_path):
        with open(log_path) as f:
            for line in f:
                if "Resumed from iteration" in line:
                    resumed = True
                    resume_iter = int(line.rsplit(None, 1)[-1])

    # dedupe on step (keep the LAST write -- the resumed run's view)
    by_step = {r["step"]: r for r in rows}
    rows = [by_step[s] for s in sorted(by_step)]

    q = max(1, len(rows) // 4)
    first_q, last_q = rows[:q], rows[-q:]

    def med(rs, key):
        vals = [r[key] for r in rs if key in r]
        return statistics.median(vals) if vals else None

    step_t0, step_t1 = med(first_q, "step_time"), med(last_q, "step_time")
    hbm0, hbm1 = med(first_q, "hbm_in_use_gb"), med(last_q, "hbm_in_use_gb")
    summary = {
        "total_logged_steps": rows[-1]["step"],
        "log_rows": len(rows),
        "resume_observed": resumed,
        "resume_iteration": resume_iter,
        "loss_first": rows[0].get("loss"),
        "loss_last": rows[-1].get("loss"),
        "loss_curve": [
            {"step": r["step"], "loss": round(r["loss"], 3)}
            for r in rows[:: max(1, len(rows) // 16)]
            if "loss" in r
        ],
        "step_time_median_first_quarter_s": step_t0,
        "step_time_median_last_quarter_s": step_t1,
        "step_time_drift_frac": (
            round(step_t1 / step_t0 - 1, 4) if step_t0 and step_t1 else None
        ),
        "hbm_in_use_gb_first_quarter": hbm0,
        "hbm_in_use_gb_last_quarter": hbm1,
        "hbm_drift_frac": round(hbm1 / hbm0 - 1, 4) if hbm0 and hbm1 else None,
        # None when the backend exposes no memory_stats (axon returns None)
        "hbm_peak_gb": max(
            (r["hbm_peak_gb"] for r in rows if r.get("hbm_peak_gb")),
            default=None,
        ),
        "data_wait_frac_median": (
            round(med(rows, "data_time") / med(rows, "step_time"), 4)
            if med(rows, "step_time")
            else None
        ),
    }

    os.makedirs(artifact_dir, exist_ok=True)
    shutil.copy(path, os.path.join(artifact_dir, "metrics.jsonl"))
    with open(os.path.join(artifact_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    summarize(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "artifacts/longrun")
