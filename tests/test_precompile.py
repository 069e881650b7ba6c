"""Shape-signature scanning + AOT precompile (cli/precompile.py).

Under XLA every (frame bucket x source canvas x output canvas) is a
separate compiled program; the precompile tool must enumerate exactly the
signatures the real loader will emit -- from plan-only samples that never
decode pixels -- and warm each program. These tests pin the two contracts:
(1) a plan-only sample is shape- and target-identical to the real raw
sample drawn with the same rng stream, and (2) the scanned signature set
covers every batch the real iterator produces.
"""

import numpy as np
import pytest

from helpers import tiny_cfg
from stcat_tpu.config import merge_from_list
from stcat_tpu.data.batching import raw_batch_signature
from stcat_tpu.data.loader import Loader
from stcat_tpu.data.synthetic import make_synthetic_dataset


def _cfg(tmp_path, extra=()):
    return merge_from_list(
        tiny_cfg(
            [
                "DATA_DIR", str(tmp_path),
                "INPUT.RESOLUTION", 64,
                "INPUT.TRAIN_SAMPLE_NUM", 8,
                "INPUT.MAX_QUERY_LEN", 12,
                # multi-scale on, crop off: several output canvases without
                # the 400-600px crop-branch canvases (slow on CPU)
                "INPUT.AUG_SCALE", "true",
                "INPUT.AUG_CROP", "false",
                "TPU.FRAME_BUCKETS", "[8,16]",
                "DATALOADER.NUM_WORKERS", 0,
            ]
        ),
        list(extra),
    )


def _batch_signature(batch):
    pix = batch.frames_y if batch.frames_u8 is None else batch.frames_u8
    layout = "yuv420" if batch.frames_u8 is None else "rgb"
    return (
        pix.shape[0], pix.shape[1], tuple(pix.shape[2:4]),
        batch.out_canvas, layout,
    )


@pytest.mark.parametrize("layout", ["rgb", "yuv420"])
def test_plan_only_sample_matches_raw(tmp_path, layout):
    cfg = _cfg(tmp_path, ["TPU.INGEST_LAYOUT", layout])
    ds = make_synthetic_dataset(cfg, "train", n_items=3, n_frames=12)
    for idx in range(3):
        real = ds.__getitem__(idx, rng=np.random.default_rng(7 + idx), raw=True)
        plan = ds.__getitem__(
            idx, rng=np.random.default_rng(7 + idx), plan_only=True
        )
        for k in ("frames_u8", "frames_y", "frames_cbcr"):
            if k in real:
                assert plan[k].shape == real[k].shape, k
                assert plan[k].dtype == real[k].dtype, k
        assert plan["plan"].out_hw == real["plan"].out_hw
        assert plan["plan"].flip == real["plan"].flip
        np.testing.assert_array_equal(plan["boxes"], real["boxes"])
        assert plan["text"] == real["text"]
        np.testing.assert_array_equal(plan["actioness"], real["actioness"])


def test_scan_covers_real_iterator(tmp_path):
    cfg = _cfg(tmp_path)
    ds = make_synthetic_dataset(cfg, "train", n_items=4, n_frames=12)
    epochs = 2
    loader = Loader(cfg, ds, global_batch=2, is_train=True)
    sigs = loader.scan_signatures(epochs)
    assert sigs, "multi-scale aug must produce at least one signature"
    # exemplars must rebuild into a batch with the scanned signature
    for sig, samples in sigs.items():
        batch, targets, _ = loader._make_batch(samples)
        assert _batch_signature(batch) == sig
        assert targets.boxes.shape[1] == sig[1]

    # every batch the REAL iterator emits over the same horizon must hit a
    # scanned signature (same permutation + per-(iteration, index) rng)
    it = iter(Loader(cfg, ds, global_batch=2, is_train=True))
    for _ in range(epochs * loader.iters_per_epoch):
        batch, _, _ = next(it)
        assert _batch_signature(batch) in sigs


def test_scan_eval_deterministic(tmp_path):
    cfg = _cfg(tmp_path)
    ds = make_synthetic_dataset(cfg, "test", n_items=3, n_frames=12)
    loader = Loader(cfg, ds, global_batch=1, is_train=False)
    sigs = loader.scan_signatures()
    it = iter(Loader(cfg, ds, global_batch=1, is_train=False))
    real = {_batch_signature(b) for b, _, _ in it}
    assert real == set(sigs)


def test_scan_rejects_legacy_path(tmp_path):
    cfg = _cfg(tmp_path, ["TPU.DEVICE_PREPROCESS", "false"])
    ds = make_synthetic_dataset(cfg, "train", n_items=2, n_frames=12)
    loader = Loader(cfg, ds, global_batch=1, is_train=True)
    with pytest.raises(ValueError):
        loader.scan_signatures()


@pytest.mark.slow
def test_precompile_cli_end_to_end(tmp_path, monkeypatch):
    """--synthetic run: scans, compiles every train+eval program, exits 0.

    Single-scale here so each mode has exactly ONE program (a CPU XLA
    compile of even the tiny model costs minutes); multi-signature
    enumeration is covered by the fast scan tests above."""
    import sys

    from stcat_tpu.cli.precompile import main

    opts = [
        "DATA_DIR", str(tmp_path), "OUTPUT_DIR", str(tmp_path / "out"),
        "INPUT.RESOLUTION", "64", "INPUT.TRAIN_SAMPLE_NUM", "8",
        "INPUT.MAX_QUERY_LEN", "12", "INPUT.AUG_SCALE", "false",
        "INPUT.AUG_CROP", "false", "TPU.FRAME_BUCKETS", "[8,16]",
        "TPU.MESH_DATA", "1",  # B=1 batches: CPU-cheap compiles
        "TPU.COMPUTE_DTYPE", "float32", "TPU.REMAT_BACKBONE", "false",
        "DATALOADER.NUM_WORKERS", "0",
        "MODEL.VISION_BACKBONE.NAME", "resnet50",
        "MODEL.VISION_BACKBONE.DEPTHS", "[1,1,1,1]",
        "MODEL.STCAT.ENC_LAYERS", "1", "MODEL.STCAT.DEC_LAYERS", "1",
        "MODEL.STCAT.HIDDEN", "64", "MODEL.STCAT.HEADS", "4",
        "MODEL.STCAT.FFN_DIM", "128", "INPUT.MAX_VIDEO_LEN", "32",
        "MODEL.TEXT_MODEL.VOCAB_SIZE", "128", "MODEL.TEXT_MODEL.HIDDEN", "32",
        "MODEL.TEXT_MODEL.LAYERS", "1", "MODEL.TEXT_MODEL.HEADS", "2",
        "MODEL.TEXT_MODEL.INTERMEDIATE", "64", "MODEL.TEXT_MODEL.MAX_POS", "64",
    ]
    # seed both splits so the scanner finds them
    from stcat_tpu.config import default_config

    seed_cfg = merge_from_list(default_config(), ["DATA_DIR", str(tmp_path)])
    make_synthetic_dataset(seed_cfg, "train", n_items=3, n_frames=12)
    make_synthetic_dataset(seed_cfg, "test", n_items=2, n_frames=12)

    monkeypatch.setattr(
        sys, "argv",
        ["precompile", "--synthetic", "--mode", "both", "--epochs", "1"] + opts,
    )
    n = main()
    assert n >= 2, n  # at least one train + one eval program
