#!/usr/bin/env bash
# VidSTG training launch (ref run_vidstg.sh). JAX owns all local chips; on a
# multi-host pod run this same script on every host with JAX_COORDINATOR set.
set -e
python -m stcat_tpu.cli.train \
  --config-file experiments/VidSTG/e2e_STCAT_R101_VidSTG.yaml \
  "$@"
