#!/usr/bin/env bash
# Long training-stability artifact (round-4 verdict task 5): >=2000 iterations
# of the flagship recipe on the real chip through the production input chain
# (JPEG corpus -> raw loader -> yuv420 ingest -> device preprocess -> jitted
# step), with periodic async checkpoints, in-training EMA validation, a
# SIGTERM preemption mid-run, and a crash-resume that continues to the end.
#
#   bash scripts/longrun_r4.sh            # phase A (to ~iter 1200), then
#                                         # phase B resume (to 2400)
#
# Artifacts: out/longrun_r4/metrics.jsonl (+ log.txt, checkpoints), summarized
# into artifacts/longrun_r4/ by scripts/longrun_summary.py.
set -euo pipefail
cd "$(dirname "$0")/.."

DATA=.cache/longrun_corpus
OUT=out/longrun_r4

python - <<'PY'
from stcat_tpu.data.synthetic import write_synthetic_cache, materialize_frame_corpus
for split, n in (("train", 12), ("test", 4)):
    write_synthetic_cache(".cache/longrun_corpus", "VidSTG", split,
                          n_items=n, n_frames=96, width=320, height=240)
    materialize_frame_corpus(".cache/longrun_corpus", "VidSTG", split)
print("corpus ready")
PY

# MAX_EPOCH 200 x iters_per_epoch 12 = 2400 steps; the LR schedule sees the
# full horizon in both phases, so resume continues the same schedule.
OPTS=(
  DATA_DIR "$DATA" OUTPUT_DIR "$OUT"
  INPUT.RESOLUTION 416
  SOLVER.MAX_EPOCH 200 SOLVER.CHECKPOINT_PERIOD 300
  SOLVER.TO_VAL true SOLVER.VAL_PERIOD 800 SOLVER.PRE_VAL false
  TPU.INGEST_LAYOUT yuv420 DATALOADER.NUM_WORKERS 2
  INPUT.AUG_SCALE false INPUT.AUG_CROP false
  TPU.COMPILE_CACHE_DIR .cache/xla
)

if [ ! -f "$OUT/last_checkpoint" ]; then
  echo "=== phase A: train from scratch, SIGTERM preemption at ~iter 1200 ==="
  python -m stcat_tpu.cli.train --synthetic "${OPTS[@]}" &
  PID=$!
  python - "$OUT" $PID <<'PY'
import json, os, signal, sys, time
out, pid = sys.argv[1], int(sys.argv[2])
path = os.path.join(out, "metrics.jsonl")
while True:
    time.sleep(20)
    try:
        os.kill(pid, 0)
    except OSError:
        sys.exit("trainer exited before the preemption point")
    it = 0
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    it = json.loads(line).get("step", it)
                except ValueError:
                    pass  # torn tail write
    if it >= 1200:
        print(f"sending SIGTERM at iteration {it}")
        os.kill(pid, signal.SIGTERM)
        break
PY
  wait $PID || true
  echo "=== phase A done (preempted) ==="
fi

echo "=== phase B: crash-resume to 2400 ==="
python -m stcat_tpu.cli.train --synthetic "${OPTS[@]}"

python scripts/longrun_summary.py "$OUT" artifacts/longrun_r4
