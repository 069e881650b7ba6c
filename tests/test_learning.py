"""Capability proof: the full training stack LEARNS to ground on content.

SURVEY.md §6's north star (m_vIoU parity on VidSTG @448) needs the
license-restricted benchmark videos plus multi-chip training time; this is
the feasible in-CI stand-in: overfit the tiny model on two synthetic clips
(a bright moving rectangle = the GT tube on a textured background,
data/synthetic.py) and assert the evaluated m_vIoU reaches strong
localization ON THOSE CLIPS. It closes the loop through the METRIC: cache
-> clip sampler -> transforms -> batching -> jitted train step (grad +
clip + AdamW 4 LR groups) -> eval engine (2-stream subsample + interp,
ref engine/evaluate.py analogue) -> vIoU evaluator, and proves the
optimization moves the benchmark number, not just the training objective.

Two design points, both discovered the hard way (r4):

- eval runs on the SAME clips that were trained: write_synthetic_cache
  seeds per split, so the default test split is different geometry -- a
  2-clip from-scratch model cannot generalize to unseen clips, and this is
  an overfit-capability test, not a generalization test. The train cache
  is copied over the test cache paths.
- the two clips share ONE gt temporal span (shared_span=True): with
  per-item spans the box loss (applied only on GT-span frames) is almost
  satisfiable by the time embedding alone ("early frame slots -> clip A's
  box, late slots -> clip B's box"), and a from-scratch run settles into
  that shortcut: 900 iters left one clip at vIoU 0 while the other was
  perfect. With identical spans the only signal distinguishing the targets
  is per-clip CONTENT, so passing proves the text/visual conditioning
  pathway actually learns (measured: both clips localize, m_vIoU 0.62 at
  900 iters). The reference never trains from scratch (MDETR init), so
  this trap is an optimization property of the shared objective, not a
  framework divergence.

A random-init model scores ~0 m_vIoU here (the box head's sigmoid starts
near the frame center at the wrong scale, the sted head is uniform), so
the threshold is far outside chance.
"""

import os
import shutil

import numpy as np
import pytest

from helpers import tiny_cfg
from stcat_tpu.config import merge_from_list


def _viou(res):
    # per-qtype keys ('declar_viou', 'inter_viou') on VidSTG, bare 'viou'
    # on HC-STVG; never the GT-span-only variants ('gt_viou', '*_gt_viou')
    keys = [
        k for k in res
        if (k == "viou" or k.endswith("_viou")) and "gt_viou" not in k
    ]
    assert keys, f"no vIoU keys in {sorted(res)}"
    return float(np.mean([res[k] for k in keys]))


@pytest.mark.slow  # ~14 min: 900 train iters + eval on the 1-core CI host
def test_overfit_moves_m_viou(tmp_path):
    from stcat_tpu.core.logging import setup_logger
    from stcat_tpu.core.mesh import make_mesh
    from stcat_tpu.data.annotations import cache_paths
    from stcat_tpu.data.synthetic import make_synthetic_dataset
    from stcat_tpu.models import STCATNet
    from stcat_tpu.train.loop import run_validation, train

    cfg = merge_from_list(
        tiny_cfg(
            [
                "DATA_DIR", str(tmp_path),
                "OUTPUT_DIR", str(tmp_path / "out"),
                "INPUT.RESOLUTION", 64,
                "INPUT.TRAIN_SAMPLE_NUM", 8,
                "INPUT.MAX_QUERY_LEN", 12,
                # deterministic pixels/boxes: overfitting two clips needs the
                # same view of them every epoch
                "INPUT.AUG_SCALE", "false",
                "INPUT.AUG_CROP", "false",
                "INPUT.FLIP_PROB_TRAIN", 0.0,
                "INPUT.TEMP_CROP_PROB", 0.0,
                # eval must see what training produced, not a 0.9998-EMA of
                # the init (a few hundred steps barely move that average)
                "MODEL.EMA", "false",
                # constant high LR: WARMUP_PROP 0 + drop step past the run
                "SOLVER.BASE_LR", 1e-3,
                "SOLVER.VIS_BACKBONE_LR", 1e-3,
                "SOLVER.TEXT_LR", 1e-3,
                "SOLVER.TEMP_LR", 1e-3,
                "SOLVER.WARMUP_PROP", 0.0,
                "SOLVER.SCHEDULE.TYPE", "multistep_with_warmup_all",
                "SOLVER.SCHEDULE.DROP_STEP", "[100000]",
                "SOLVER.MAX_EPOCH", 100000,
                "SOLVER.VAL_PERIOD", 1000000,
                "SOLVER.CHECKPOINT_PERIOD", 1000000,
                "TPU.FRAME_BUCKETS", "[8,16]",
                "TPU.MESH_DATA", 1,
                "DATALOADER.NUM_WORKERS", 0,
            ]
        ),
        [],
    )
    logger = setup_logger("learn", rank=0)

    def builder(c, split):
        if split != "train":
            # eval on the trained clips (see module docstring)
            make_synthetic_dataset(
                c, "train", n_items=2, n_frames=12, shared_span=True
            )
            for src, dst in zip(
                cache_paths(c.DATA_DIR, c.DATASET.NAME, "train"),
                cache_paths(c.DATA_DIR, c.DATASET.NAME, split),
            ):
                if not os.path.exists(dst):
                    shutil.copy(src, dst)
        return make_synthetic_dataset(
            c, split, n_items=2, n_frames=12, shared_span=True
        )

    mesh = make_mesh(cfg.TPU.MESH_DATA)
    model = STCATNet(cfg)

    state, it = train(cfg, dataset_builder=builder, logger=logger,
                      max_iters=900)
    assert it == 900
    res = run_validation(cfg, model, state, mesh, builder, logger)
    viou = _viou(res)
    # chance m_vIoU of a random-init model is ~0; a trained one must
    # localize the tube spatially AND temporally on BOTH clips (measured
    # 0.62 at 900 iters: declar 0.78, inter 0.46)
    assert viou > 0.30, (viou, res)
    # both query types must clear zero individually: a positional-shortcut
    # solution scores ~0 on one of them (module docstring)
    assert res["declar_viou"] > 0.15 and res["inter_viou"] > 0.15, res

    # bf16 metric drift (verdict r4 task 2): re-evaluate the SAME trained
    # fp32 params with bf16 compute (TPU.COMPUTE_DTYPE, the production
    # path; the reference is fp32-only, scripts/train_net.py -- no AMP).
    # Drift is pinned at the metric level; measured values are tabulated
    # in docs/STATUS.md ("fp32 vs bf16 metric drift").
    from stcat_tpu.models import STCATNet as _Net

    cfg_bf16 = merge_from_list(cfg, ["TPU.COMPUTE_DTYPE", "bfloat16"])
    res_bf16 = run_validation(
        cfg_bf16, _Net(cfg_bf16), state, mesh, builder, logger
    )
    drift = {k: res_bf16[k] - res[k] for k in res}
    print("bf16 metric drift:",
          {k: round(v, 4) for k, v in sorted(drift.items())})
    viou_drift = abs(_viou(res_bf16) - viou)
    tiou_keys = [k for k in res if k.endswith("tiou")]
    tiou_drift = max(abs(res_bf16[k] - res[k]) for k in tiou_keys)
    assert viou_drift < 0.05, (viou_drift, res, res_bf16)
    assert tiou_drift < 0.05, (tiou_drift, res, res_bf16)
