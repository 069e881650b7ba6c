"""End-to-end input pipeline: REAL JPEG decode -> raw loader -> device
preprocess -> jitted train step, plus eval exactly-once semantics.

This is the chain the reference runs through torch dataloader workers
(datasets/vidstg.py:112-198 + engine loops); here the decode is a real image
codec (PIL JPEG via the frame-dir branch), the loader ships uint8
RawVideoBatches, and pixels are resampled on device.
"""

import numpy as np
import pytest

import jax

from stcat_tpu.config import default_config, merge_from_list
from stcat_tpu.core.batch import RawVideoBatch
from stcat_tpu.core.mesh import make_mesh, shard_batch
from stcat_tpu.data.datasets import VidSTGDataset
from stcat_tpu.data.loader import Loader
from stcat_tpu.data.synthetic import (
    materialize_frame_corpus,
    write_synthetic_cache,
)

TINY = [
    "INPUT.RESOLUTION", "64", "INPUT.TRAIN_SAMPLE_NUM", "6",
    "INPUT.MAX_QUERY_LEN", "12", "INPUT.MAX_VIDEO_LEN", "32",
    "MODEL.VISION_BACKBONE.DEPTHS", "[1,1,1,1]",
    "MODEL.STCAT.ENC_LAYERS", "1", "MODEL.STCAT.DEC_LAYERS", "1",
    "MODEL.STCAT.HIDDEN", "64", "MODEL.STCAT.HEADS", "4",
    "MODEL.STCAT.FFN_DIM", "128",
    "MODEL.TEXT_MODEL.VOCAB_SIZE", "512", "MODEL.TEXT_MODEL.HIDDEN", "32",
    "MODEL.TEXT_MODEL.LAYERS", "1", "MODEL.TEXT_MODEL.HEADS", "2",
    "MODEL.TEXT_MODEL.INTERMEDIATE", "64", "MODEL.TEXT_MODEL.MAX_POS", "64",
    "TPU.FRAME_BUCKETS", "[8]", "TPU.COMPUTE_DTYPE", "float32",
    "TPU.REMAT_BACKBONE", "false", "DATALOADER.NUM_WORKERS", "2",
    "SOLVER.MAX_EPOCH", "1",
]


def corpus_cfg(tmp_path, extra=()):
    cfg = merge_from_list(
        default_config(), ["DATA_DIR", str(tmp_path), "DATASET.NAME", "VidSTG"]
        + TINY + list(extra),
    )
    write_synthetic_cache(str(tmp_path), "VidSTG", "train", n_items=5, n_frames=10)
    write_synthetic_cache(str(tmp_path), "VidSTG", "test", n_items=5, n_frames=10)
    n = materialize_frame_corpus(str(tmp_path), "VidSTG", "train")
    materialize_frame_corpus(str(tmp_path), "VidSTG", "test")
    assert n > 0
    return cfg


class CountingDataset(VidSTGDataset):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.decodes = 0

    def load_frames(self, item):
        self.decodes += 1
        return super().load_frames(item)


@pytest.mark.slow  # ~130 s: JPEG corpus + full raw-loader train-step chain
def test_jpeg_decode_raw_train_chain(tmp_path):
    # single-scale, no crop: the whole run stays in ONE compiled canvas so
    # the second batch must reuse the first step's program (multi-scale aug
    # legitimately produces a small set of canvases -> one program each)
    cfg = corpus_cfg(tmp_path, ["INPUT.AUG_SCALE", "false", "INPUT.AUG_CROP", "false"])
    ds = CountingDataset(cfg, "train")
    loader = Loader(cfg, ds, global_batch=2, is_train=True, num_workers=2)
    assert loader.raw  # DEVICE_PREPROCESS default-on + real dataset

    it = iter(loader)
    batch, targets, meta = next(it)
    assert isinstance(batch, RawVideoBatch)
    assert batch.frames_u8.dtype == np.uint8
    assert ds.decodes == 2 or ds.decodes >= 2  # prefetch may run ahead
    # JPEG round-trip: the GT rectangle (220 gray) must survive decode
    assert batch.frames_u8.max() > 180

    from stcat_tpu.models import STCATNet
    from stcat_tpu.train.optimizer import make_optimizer
    from stcat_tpu.train.step import (
        create_train_state, init_variables, make_train_step,
    )

    model = STCATNet(cfg)
    variables = init_variables(cfg, model, jax.random.PRNGKey(0), batch)
    mesh = make_mesh(1)
    tx, _ = make_optimizer(cfg, variables["params"], num_training_steps=4)
    state = create_train_state(cfg, variables, tx)
    step = make_train_step(cfg, model, tx, mesh)
    state, m = step(
        state, shard_batch(batch, mesh), shard_batch(targets, mesh),
        jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(m["loss"]))
    # second batch reuses the compiled program (same canvas)
    batch2, targets2, _ = next(it)
    assert batch2.out_canvas == batch.out_canvas
    state, m2 = step(
        state, shard_batch(batch2, mesh), shard_batch(targets2, mesh),
        jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(m2["loss"]))


def test_eval_items_decoded_and_predicted_exactly_once(tmp_path):
    """5 items, global_batch 2 -> 3 batches (6 rows, 1 wrap-around filler):
    the filler row is not decoded again and never reaches the evaluator."""
    cfg = corpus_cfg(tmp_path)
    ds = CountingDataset(cfg, "test")
    loader = Loader(cfg, ds, global_batch=2, is_train=False, num_workers=1)

    from stcat_tpu.eval import build_evaluator
    from stcat_tpu.eval.engine import do_eval

    evaluator = build_evaluator(cfg, None, "test")

    def fake_fwd(params, constants, batch):
        b, t = batch.frame_valid.shape
        return {
            "pred_boxes": np.full((b, t, 4), 0.5, np.float32),
            "pred_sted": np.zeros((b, t, 2), np.float32),
        }

    res = do_eval(cfg, None, None, None, loader, evaluator, fake_fwd)
    assert ds.decodes == 5  # each item decoded exactly once, filler reused
    assert len(evaluator.predictions) == 5
    assert len(evaluator.video_predictions) == 5
    assert res is not None


def test_pad_rows_marked(tmp_path):
    cfg = corpus_cfg(tmp_path)
    ds = VidSTGDataset(cfg, "test")
    loader = Loader(cfg, ds, global_batch=2, is_train=False, num_workers=1)
    pads = [m["pad"] for _, _, meta in loader for m in meta]
    assert sum(pads) == 1 and len(pads) == 6
