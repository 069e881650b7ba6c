"""CLI wiring tests: argument parsing, config plumbing, end-to-end mains."""

import os
import sys

import pytest


TINY_OPTS = [
    "INPUT.RESOLUTION", "64", "INPUT.TRAIN_SAMPLE_NUM", "6",
    "MODEL.VISION_BACKBONE.DEPTHS", "[1,1,1,1]",
    "MODEL.STCAT.ENC_LAYERS", "2", "MODEL.STCAT.DEC_LAYERS", "2",
    "MODEL.STCAT.HIDDEN", "64", "MODEL.STCAT.HEADS", "4",
    "MODEL.STCAT.FFN_DIM", "128",
    "MODEL.TEXT_MODEL.VOCAB_SIZE", "512", "MODEL.TEXT_MODEL.HIDDEN", "32",
    "MODEL.TEXT_MODEL.LAYERS", "2", "MODEL.TEXT_MODEL.HEADS", "2",
    "MODEL.TEXT_MODEL.INTERMEDIATE", "64", "MODEL.TEXT_MODEL.MAX_POS", "64",
    "INPUT.MAX_VIDEO_LEN", "32", "INPUT.MAX_QUERY_LEN", "12",
    "TPU.FRAME_BUCKETS", "[16]", "TPU.COMPUTE_DTYPE", "float32",
    "TPU.REMAT_BACKBONE", "false", "DATALOADER.NUM_WORKERS", "1",
    "SOLVER.MAX_EPOCH", "1",
    "SOLVER.SCHEDULE.TYPE", "multistep_with_warmup_all",
]


@pytest.mark.slow
def test_train_then_eval_cli(tmp_path, monkeypatch):
    data = str(tmp_path / "data")
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)

    from stcat_tpu.cli.train import main as train_main

    monkeypatch.setattr(
        sys, "argv",
        ["train", "--synthetic", "--max-iters", "2",
         "DATA_DIR", data, "OUTPUT_DIR", out] + TINY_OPTS,
    )
    train_main()
    assert os.path.exists(os.path.join(out, "checkpoints", "last_checkpoint"))
    assert os.path.exists(os.path.join(out, "config.yml"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    # the persistent XLA compile cache defaults into OUTPUT_DIR (assert the
    # config resolution, not the directory: with the tiny e2e config every
    # compile can finish under the min-compile-time threshold and the
    # directory is then legitimately never created)
    import jax

    assert jax.config.jax_compilation_cache_dir == os.path.join(out, "compile_cache")

    from stcat_tpu.cli.test import main as test_main

    monkeypatch.setattr(
        sys, "argv",
        ["test", "--synthetic", "DATA_DIR", data, "OUTPUT_DIR", out] + TINY_OPTS,
    )
    res = test_main()
    assert res is not None
    assert any(k.endswith("_viou") for k in res)
    assert os.path.exists(os.path.join(out, "test_results.json"))


@pytest.mark.slow
def test_convert_cli_then_eval(tmp_path, monkeypatch):
    """torch .pth (reference naming) -> convert CLI -> eval CLI loads it."""
    import numpy as np

    torch = pytest.importorskip("torch")
    from test_convert_reference import ref_state_dict
    from stcat_tpu.config import default_config, merge_from_list

    # the state dict must match the EXACT config the CLIs run with
    cfg = merge_from_list(default_config(), TINY_OPTS)
    sd = ref_state_dict(cfg, np.random.RandomState(0))
    src = str(tmp_path / "ref.pth")
    torch.save(
        {"model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, src
    )

    from stcat_tpu.cli.convert import main as convert_main

    ck = str(tmp_path / "ck")
    monkeypatch.setattr(sys, "argv", ["convert", "--src", src, "--out", ck] + TINY_OPTS)
    convert_main()
    assert os.path.exists(os.path.join(ck, "checkpoints", "last_checkpoint"))

    from stcat_tpu.cli.test import main as test_main

    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    monkeypatch.setattr(
        sys, "argv",
        ["test", "--synthetic", "DATA_DIR", str(tmp_path / "data"),
         "OUTPUT_DIR", out, "MODEL.WEIGHT", ck,
         # the converted checkpoint is reference-derived and this env has no
         # real roberta vocab, so the hash-tokenizer guard (task 4) would
         # refuse; the raise path itself is pinned in test_tokenizer_guard.py
         "MODEL.TEXT_MODEL.ALLOW_HASH_TOKENIZER", "true"] + TINY_OPTS,
    )
    res = test_main()
    assert res is not None and any(k.endswith("_tiou") for k in res)
