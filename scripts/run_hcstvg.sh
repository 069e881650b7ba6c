#!/usr/bin/env bash
# HC-STVG v1 training launch (ref run_hcstvg.sh).
set -e
python -m stcat_tpu.cli.train \
  --config-file experiments/HC-STVG/e2e_STCAT_R101_HCSTVG.yaml \
  "$@"
