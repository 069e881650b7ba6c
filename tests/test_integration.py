"""End-to-end integration: synthetic train loop + full eval + checkpoint resume.

The SURVEY.md §4 test pyramid's integration layer: 2-step training on a
synthetic dataset asserting loss decrease and resume idempotence; full eval on
a synthetic annotation cache through the real engine/evaluator path.
"""

import os

import jax
import numpy as np
import pytest

from stcat_tpu.config import merge_from_list
from helpers import tiny_cfg


def integration_cfg(tmp_path, extra=()):
    return merge_from_list(
        tiny_cfg(
            [
                "DATA_DIR", str(tmp_path),
                "OUTPUT_DIR", str(tmp_path / "out"),
                "INPUT.RESOLUTION", 64,
                "INPUT.TRAIN_SAMPLE_NUM", 8,
                "INPUT.MAX_QUERY_LEN", 12,
                "SOLVER.MAX_EPOCH", 2,
                "SOLVER.CHECKPOINT_PERIOD", 2,
                "SOLVER.VAL_PERIOD", 100000,
                "SOLVER.SCHEDULE.TYPE", "multistep_with_warmup_all",
                "SOLVER.WARMUP_PROP", 0.0,
                "TPU.FRAME_BUCKETS", "[8,16]",
                "TPU.MESH_DATA", 2,
                "DATALOADER.NUM_WORKERS", 2,
            ]
        ),
        list(extra),
    )


@pytest.mark.slow
def test_synthetic_train_eval_and_resume(tmp_path):
    from stcat_tpu.data.synthetic import make_synthetic_dataset
    from stcat_tpu.train.loop import train, run_validation
    from stcat_tpu.core.logging import setup_logger

    cfg = integration_cfg(tmp_path)
    logger = setup_logger("it", rank=0)
    builder = lambda c, split: make_synthetic_dataset(
        c, split, n_items=4, n_frames=12
    )

    state, it = train(cfg, dataset_builder=builder, logger=logger, max_iters=3)
    assert it == 3
    assert int(state.step) == 3

    # checkpoint written at period 2 + final
    ckpt_dir = os.path.join(cfg.OUTPUT_DIR, "checkpoints")
    assert os.path.exists(os.path.join(ckpt_dir, "last_checkpoint"))

    # resume: a fresh train() must pick up from the saved step
    state2, it2 = train(cfg, dataset_builder=builder, logger=logger, max_iters=4)
    assert it2 == 4

    # full eval path on the synthetic test split
    from stcat_tpu.core.mesh import make_mesh
    from stcat_tpu.models import STCATNet

    mesh = make_mesh(cfg.TPU.MESH_DATA)
    model = STCATNet(cfg)
    res = run_validation(cfg, model, state2, mesh, builder, logger)
    assert res is not None
    assert "declar_viou" in res or "inter_viou" in res
    for k, v in res.items():
        assert np.isfinite(v), (k, v)


@pytest.mark.slow
def test_hcstvg_synthetic_train_eval(tmp_path):
    """The HC-STVG family end-to-end: fps-based clip sampling
    (make_hcstvg_input_clip, ref data_utils.py:81-155) -> transforms ->
    batching -> jitted train step -> eval engine -> the HC-STVG evaluator's
    bare-key metrics (no per-qtype split). The VidSTG chain above and the
    piecewise HC-STVG parity tests (sampler, evaluator) meet here."""
    from stcat_tpu.core.logging import setup_logger
    from stcat_tpu.core.mesh import make_mesh
    from stcat_tpu.data.synthetic import make_synthetic_dataset
    from stcat_tpu.models import STCATNet
    from stcat_tpu.train.loop import run_validation, train

    cfg = integration_cfg(tmp_path, [
        "DATASET.NAME", "HC-STVG",
        "INPUT.SAMPLE_FPS", 5,
        "TPU.MESH_DATA", 1,
        "DATALOADER.NUM_WORKERS", 0,
    ])
    logger = setup_logger("it-hc", rank=0)
    builder = lambda c, split: make_synthetic_dataset(
        c, split, n_items=3, n_frames=20
    )

    state, it = train(cfg, dataset_builder=builder, logger=logger, max_iters=2)
    assert it == 2

    mesh = make_mesh(cfg.TPU.MESH_DATA)
    model = STCATNet(cfg)
    res = run_validation(cfg, model, state, mesh, builder, logger)
    assert res is not None
    # HC-STVG summarizes without qtype buckets (eval/evaluator.py per_qtype)
    assert "viou" in res and "tiou" in res and "gt_viou" in res, sorted(res)
    for k, v in res.items():
        assert np.isfinite(v), (k, v)
