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


def test_scan_eval_padded_batches_mixed_geometry(tmp_path):
    """Eval with global_batch > 1 and heterogeneous item geometry: the
    wrap-around pad rows must reuse the batch's FIRST REAL sample (as
    _eval_iter does), so the scanned signatures are the real padded-batch
    signatures, not phantoms built from the wrapped index's own item."""
    cfg = _cfg(tmp_path)
    # 5 items over global_batch=2 -> the last batch has 1 real + 1 pad row;
    # vary_geometry makes the wrapped item (index 0) DIFFER in size/duration
    # from the pad batch's real sample, so a scanner that loads the wrapped
    # index's own item produces a phantom signature (the ADVICE r3 repro)
    ds = make_synthetic_dataset(
        cfg, "test", n_items=5, n_frames=12, vary_geometry=True
    )
    loader = Loader(cfg, ds, global_batch=2, is_train=False)
    sigs = loader.scan_signatures()
    it = iter(Loader(cfg, ds, global_batch=2, is_train=False))
    real = {_batch_signature(b) for b, _, _ in it}
    assert real == set(sigs), (
        f"scan/iterator signature mismatch: scan-only "
        f"{set(sigs) - real}, iterator-only {real - set(sigs)}"
    )


def test_scan_eval_all_pad_batch(tmp_path):
    """A shard whose whole batch is wrap-around padding (tiny dataset on a
    big mesh) must scan the same decode-one-row signature _eval_iter emits."""
    cfg = _cfg(tmp_path)
    ds = make_synthetic_dataset(cfg, "test", n_items=3, n_frames=12)
    loader = Loader(cfg, ds, global_batch=4, is_train=False)
    sigs = loader.scan_signatures()
    it = iter(Loader(cfg, ds, global_batch=4, is_train=False))
    real = {_batch_signature(b) for b, _, _ in it}
    assert real == set(sigs)


@pytest.mark.slow  # >13 s on the 1-core CI host; fast-gate budget (verdict r5 task 3)
def test_precompile_train_horizon_matches_train(tmp_path, monkeypatch):
    """The LR-schedule horizon is baked into the jitted step's HLO, so the
    persistent-cache key matches the production run ONLY if precompile
    builds its optimizer with the exact num_training_steps train() derives
    (cfg.SOLVER.MAX_EPOCH * iters_per_epoch, train/loop.py:89)."""
    import sys

    import stcat_tpu.train.optimizer as opt_mod
    from stcat_tpu.cli.precompile import main
    from stcat_tpu.config import default_config

    opts = [
        "DATA_DIR", str(tmp_path),
        "INPUT.RESOLUTION", "64", "INPUT.TRAIN_SAMPLE_NUM", "8",
        "INPUT.MAX_QUERY_LEN", "12", "INPUT.AUG_SCALE", "false",
        "INPUT.AUG_CROP", "false", "TPU.FRAME_BUCKETS", "[8,16]",
        "TPU.MESH_DATA", "1", "DATALOADER.NUM_WORKERS", "0",
        "SOLVER.MAX_EPOCH", "7",
        # tiny model: init_variables jit-compiles before the optimizer spy
        "MODEL.VISION_BACKBONE.NAME", "resnet50",
        "MODEL.VISION_BACKBONE.DEPTHS", "[1,1,1,1]",
        "MODEL.STCAT.ENC_LAYERS", "1", "MODEL.STCAT.DEC_LAYERS", "1",
        "MODEL.STCAT.HIDDEN", "64", "MODEL.STCAT.HEADS", "4",
        "MODEL.STCAT.FFN_DIM", "128", "INPUT.MAX_VIDEO_LEN", "32",
        "MODEL.TEXT_MODEL.VOCAB_SIZE", "128", "MODEL.TEXT_MODEL.HIDDEN", "32",
        "MODEL.TEXT_MODEL.LAYERS", "1", "MODEL.TEXT_MODEL.HEADS", "2",
        "MODEL.TEXT_MODEL.INTERMEDIATE", "64", "MODEL.TEXT_MODEL.MAX_POS", "64",
    ]
    seed_cfg = merge_from_list(default_config(), ["DATA_DIR", str(tmp_path)])
    make_synthetic_dataset(seed_cfg, "train", n_items=3, n_frames=12)

    captured = {}

    class _Stop(Exception):
        pass

    def spy(cfg, params, num_training_steps):
        captured["n"] = num_training_steps
        raise _Stop

    monkeypatch.setattr(opt_mod, "make_optimizer", spy)
    monkeypatch.setattr(
        sys, "argv",
        ["precompile", "--synthetic", "--mode", "train", "--epochs", "1"] + opts,
    )
    import pytest as _pytest

    with _pytest.raises(_Stop):
        main()

    cfg = merge_from_list(default_config(), opts)
    ds = make_synthetic_dataset(cfg, "train", n_items=3, n_frames=12)
    loader = Loader(cfg, ds, global_batch=1, is_train=True)
    assert captured["n"] == cfg.SOLVER.MAX_EPOCH * loader.iters_per_epoch


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
