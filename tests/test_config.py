"""Config system tests: defaults, YAML merge, CLI overrides, immutability."""

import dataclasses

import pytest

from stcat_tpu.config import default_config, merge_from_file, merge_from_list, save_config, to_dict


def test_defaults_match_reference_values():
    cfg = default_config()
    # spot-check against ref config/defaults.py
    assert cfg.INPUT.MAX_QUERY_LEN == 26
    assert cfg.INPUT.TRAIN_SAMPLE_NUM == 64
    assert cfg.MODEL.STCAT.HIDDEN == 256
    assert cfg.MODEL.STCAT.HEADS == 8
    assert cfg.MODEL.EMA_DECAY == 0.9998
    assert cfg.SOLVER.EOS_COEF == 0.1
    assert cfg.SOLVER.SIGMA == 2.0
    assert cfg.SOLVER.MAX_GRAD_NORM == 0.1


def test_merge_from_list():
    cfg = default_config()
    cfg2 = merge_from_list(cfg, ["SOLVER.BASE_LR", "1e-4", "INPUT.RESOLUTION", 448,
                                 "MODEL.STCAT.FROM_SCRATCH", "false",
                                 "SOLVER.SCHEDULE.DROP_STEP", "[8, 10]"])
    assert cfg2.SOLVER.BASE_LR == 1e-4
    assert cfg2.INPUT.RESOLUTION == 448
    assert cfg2.MODEL.STCAT.FROM_SCRATCH is False
    assert cfg2.SOLVER.SCHEDULE.DROP_STEP == (8, 10)
    # original untouched (frozen tree)
    assert cfg.INPUT.RESOLUTION == 224
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg2.SEED = 7


def test_unknown_key_rejected():
    cfg = default_config()
    with pytest.raises(KeyError):
        merge_from_list(cfg, ["SOLVER.NO_SUCH_FLAG", 1])


def test_yaml_roundtrip(tmp_path):
    cfg = default_config()
    cfg = merge_from_list(cfg, ["INPUT.RESOLUTION", 448, "DATASET.NAME", "HC-STVG"])
    p = tmp_path / "cfg.yml"
    save_config(cfg, str(p))
    cfg2 = merge_from_file(default_config(), str(p))
    assert to_dict(cfg2) == to_dict(cfg)


def test_yaml_recipe_style(tmp_path):
    p = tmp_path / "exp.yml"
    p.write_text(
        """
DATASET:
  NAME: VidSTG
INPUT:
  RESOLUTION: 448
SOLVER:
  BBOX_COEF: 5
  GIOU_COEF: 3
  TEMP_COEF: 10
  MAX_EPOCH: 10
  SCHEDULE:
    TYPE: multistep_with_warmup_all
    DROP_STEP: [8, 10]
"""
    )
    cfg = merge_from_file(default_config(), str(p))
    assert cfg.SOLVER.GIOU_COEF == 3.0
    assert cfg.SOLVER.SCHEDULE.TYPE == "multistep_with_warmup_all"
    assert cfg.SOLVER.SCHEDULE.DROP_STEP == (8, 10)
