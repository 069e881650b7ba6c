"""cli.repro end-to-end: synthetic cache + synthetic reference-shaped
state_dict stand in for the real assets (verdict r4 task 5). The command
must convert -> evaluate -> report metrics vs the model-zoo targets, and
must HARD-FAIL under the hash tokenizer unless explicitly overridden.
"""

import json

import numpy as np
import pytest
import torch

from stcat_tpu.config import default_config, merge_from_list

from test_cli import TINY_OPTS
from test_convert_reference import ref_state_dict


def _write_ref_pth(tmp_path, opts):
    cfg = merge_from_list(default_config(), list(opts))
    sd = ref_state_dict(cfg, np.random.RandomState(0))
    path = tmp_path / "ref_synth.pth"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
               str(path))
    return str(path)


@pytest.mark.slow  # converts + jits the tiny model for a full eval pass
def test_repro_end_to_end(tmp_path, monkeypatch):
    from stcat_tpu.cli import repro

    weights = _write_ref_pth(tmp_path, TINY_OPTS)
    # argparse REMAINDER: every --flag must come BEFORE the first bare
    # KEY VALUE config opt
    flags = [
        "--weights", weights,
        "--data-dir", str(tmp_path / "data"),
        "--synthetic",
    ]
    opts = TINY_OPTS + ["OUTPUT_DIR", str(tmp_path / "out")]

    # 1) reference-derived .pth + hash tokenizer must refuse to evaluate
    with pytest.raises(RuntimeError, match="HASH tokenizer"):
        repro.main(flags + opts)

    # 2) explicit override: full convert -> eval -> report
    # give the tiny resolution a fake model-zoo row so the target/delta
    # path is exercised (real rows exist only for 416/448)
    monkeypatch.setitem(
        repro.MODEL_ZOO, ("VidSTG", 64),
        {"declar_viou": 10.0, "inter_viou": 10.0},
    )
    report = repro.main(
        flags + opts + ["MODEL.TEXT_MODEL.ALLOW_HASH_TOKENIZER", "true"]
    )
    assert report["dataset"] == "VidSTG"
    assert report["resolution"] == 64
    assert "declar_viou" in report["metrics"]
    assert "inter_viou" in report["metrics"]
    assert set(report["deltas"]) == {"declar_viou", "inter_viou"}
    for k, d in report["deltas"].items():
        assert d == pytest.approx(report["metrics"][k] - 10.0, abs=0.01)

    # 3) --require-within gate: random weights score ~0, far below the fake
    # 10-pt target, so a tight gate must exit non-zero
    with pytest.raises(SystemExit):
        repro.main(
            flags + ["--require-within", "0.5"] + opts
            + ["MODEL.TEXT_MODEL.ALLOW_HASH_TOKENIZER", "true"]
        )


def test_repro_report_shape_without_target(monkeypatch):
    """Target-less resolutions report a note instead of deltas."""
    from stcat_tpu.cli import repro

    monkeypatch.setattr(
        repro, "MODEL_ZOO", dict(repro.MODEL_ZOO)  # copy, no (VidSTG, 32) row
    )

    def fake_test_main():
        return {"declar_viou": 0.5, "inter_viou": 0.4, "tiou": 0.6}

    import stcat_tpu.cli.test as tcli

    monkeypatch.setattr(tcli, "main", fake_test_main)
    report = repro.main([
        "--weights", "w.pth", "--data-dir", "d",
        "INPUT.RESOLUTION", "32",
    ])
    assert "note" in report
    assert report["metrics"]["declar_viou"] == 50.0
    assert report["deltas"] == {}
    json.dumps(report)  # must be serializable
