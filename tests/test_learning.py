"""Capability proof: the full training stack LEARNS to ground.

SURVEY.md §6's north star (m_vIoU parity on VidSTG @448) needs the
license-restricted benchmark videos plus multi-chip training time; this is
the feasible in-CI stand-in: overfit the tiny model on two synthetic clips
(a bright moving rectangle = the GT tube on a noise background,
data/synthetic.py) and assert the evaluated m_vIoU reaches strong
localization. Unlike the loss-decrease check in test_integration.py, this
closes the loop through the METRIC: it exercises cache -> clip sampler ->
transforms -> batching -> jitted train step (grad + clip + AdamW 4 LR
groups) -> eval engine (2-stream subsample + interp, engine/evaluate.py
analogue) -> vIoU evaluator, and proves the optimization actually moves
the benchmark number, not just the training objective. A random-init model
scores ~0 m_vIoU on this task (the box head's sigmoid starts near the
frame center at the wrong scale, and the sted head is uniform), so the
threshold below is far outside chance.
"""

import numpy as np
import pytest

from helpers import tiny_cfg
from stcat_tpu.config import merge_from_list


def _viou(res):
    keys = [k for k in res if k.endswith("_viou") and not k.startswith("gt")]
    assert keys, f"no vIoU keys in {sorted(res)}"
    return float(np.mean([res[k] for k in keys]))


@pytest.mark.slow
def test_overfit_moves_m_viou(tmp_path):
    from stcat_tpu.core.logging import setup_logger
    from stcat_tpu.core.mesh import make_mesh
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
                "SOLVER.BASE_LR", 5e-4,
                "SOLVER.VIS_BACKBONE_LR", 5e-4,
                "SOLVER.TEXT_LR", 5e-4,
                "SOLVER.TEMP_LR", 5e-4,
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
    builder = lambda c, split: make_synthetic_dataset(
        c, split, n_items=2, n_frames=12
    )
    mesh = make_mesh(cfg.TPU.MESH_DATA)
    model = STCATNet(cfg)

    state, it = train(cfg, dataset_builder=builder, logger=logger,
                      max_iters=280)
    assert it == 280
    res = run_validation(cfg, model, state, mesh, builder, logger)
    viou = _viou(res)
    # chance m_vIoU of a random-init model on the noise background is ~0; a
    # trained one must localize the tube both spatially and temporally
    assert viou > 0.30, (viou, res)
