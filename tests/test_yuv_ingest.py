"""YUV 4:2:0 raw ingest (cfg.TPU.INGEST_LAYOUT "yuv420").

Ships a luma plane + quarter-res interleaved CbCr instead of uint8 RGB --
half the host->device bytes. JPEG/H.264 sources store 4:2:0 YCbCr natively
(the reference's PIL path converts to RGB on host, ref vidstg.py:143-150),
so this layout ships what the codec decoded; the chroma upsample fuses into
the device resample (ops/preprocess.py _resample_yuv_clip).
"""

import numpy as np
import pytest

import jax

from stcat_tpu.config import default_config, merge_from_list
from stcat_tpu.core.batch import RawVideoBatch, subsample_stream
from stcat_tpu.core.mesh import make_mesh, shard_batch
from stcat_tpu.data.decode import rgb_to_yuv420
from stcat_tpu.ops.preprocess import preprocess

MEAN, STD = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)


def _place_with_edge(dst, src, h, w):
    """Copy [T, h, w, ...] into the canvas and replicate the boundary
    row/col once (what data/batching.py build_raw_batch does)."""
    dst[:, :h, :w] = src
    if h < dst.shape[1]:
        dst[:, h, :w] = src[:, h - 1]
    if w < dst.shape[2]:
        dst[:, : min(h + 1, dst.shape[1]), w] = \
            dst[:, : min(h + 1, dst.shape[1]), w - 1]


def _make_raw(rgb, yuv: bool, flip=False, out_hw=(32, 48), canvas=(64, 64)):
    t, h, w = rgb.shape[:3]
    hs, ws = canvas
    bx = float(ws - w) if flip else 0.0
    kw = dict(
        frame_valid=np.ones((1, t), bool),
        flip=np.full((1,), flip, bool),
        affine_scale=np.asarray([[h / out_hw[0], w / out_hw[1]]], np.float32),
        affine_off=np.asarray([[0.0, bx]], np.float32),
        out_size=np.asarray([out_hw], np.int32),
        token_ids=np.zeros((1, 4), np.int32),
        token_valid=np.ones((1, 4), bool),
        out_canvas=out_hw,
    )
    if yuv:
        y, cbcr = rgb_to_yuv420(rgb)
        fy = np.zeros((1, t, hs, ws), np.uint8)
        fc = np.zeros((1, t, hs // 2, ws // 2, 2), np.uint8)
        _place_with_edge(fy[0], y, h, w)
        _place_with_edge(fc[0], cbcr, (h + 1) // 2, (w + 1) // 2)
        return RawVideoBatch(
            frames_u8=None, frames_y=fy, frames_cbcr=fc, **kw
        )
    f = np.zeros((1, t, hs, ws, 3), np.uint8)
    _place_with_edge(f[0], rgb, h, w)
    return RawVideoBatch(frames_u8=f, **kw)


def test_grey_clip_paths_agree_exactly():
    """Constant chroma (grey) makes 4:2:0 lossless: the YUV device path must
    reproduce the RGB device path to float tolerance (also pins the chroma
    zero point at 128/255, not 0.5)."""
    rng = np.random.RandomState(0)
    g = rng.randint(0, 256, (3, 36, 52), np.uint8)
    rgb = np.stack([g, g, g], -1)
    a = preprocess(_make_raw(rgb, False), MEAN, STD).frames
    b = preprocess(_make_raw(rgb, True), MEAN, STD).frames
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("flip", [False, True])
def test_color_clip_within_chroma_subsampling_tolerance(flip):
    """Colored content: the only deviation allowed is the 4:2:0 chroma
    quantization itself (sources are already 4:2:0, so this is not a loss
    vs the codec). Flip must hit the same tolerance: flipping the chroma
    plane composes exactly with the flip-adjusted luma affine."""
    xx, yy = np.meshgrid(np.arange(52), np.arange(36))
    sm = np.stack(
        [96 + xx, 80 + yy, 100 + (xx + yy) // 2], -1
    ).clip(0, 255).astype(np.uint8)
    rgb = np.repeat(sm[None], 3, 0)
    a = np.asarray(preprocess(_make_raw(rgb, False, flip), MEAN, STD).frames)
    b = np.asarray(preprocess(_make_raw(rgb, True, flip), MEAN, STD).frames)
    # smooth gradients: sub-LSB mean error, couple-LSB max (normalized units)
    assert np.abs(a - b).max() < 0.06, np.abs(a - b).max()
    assert np.abs(a - b).mean() < 0.01


def test_masks_and_subsample_stream():
    rgb = np.random.RandomState(1).randint(0, 256, (4, 36, 52, 3), np.uint8)
    raw = _make_raw(rgb, True)
    out = preprocess(raw, MEAN, STD)
    assert out.frames.shape == (1, 4, 32, 48, 3)
    assert bool(out.pixel_valid.all())
    s0, s1 = subsample_stream(raw, 0), subsample_stream(raw, 1)
    assert s0.frames_y.shape[1] == 2 and s1.frames_cbcr.shape[1] == 2
    assert np.array_equal(np.asarray(s0.frames_y), raw.frames_y[:, 0::2])


def test_native_yuv_decoder_matches_host_conversion(tmp_path):
    """Native libjpeg 4:2:0 decode vs decoding RGB and converting on host.
    Mid-range pixels (no saturation clipping in the codec's own YCbCr->RGB
    round-trip, where the two paths legitimately differ: the native path
    keeps the codec's exact Y)."""
    from PIL import Image

    from stcat_tpu.data.jpeg_decode import (
        decode_jpeg_batch, decode_jpeg_batch_yuv,
    )

    h, w = 37, 53  # odd dims: exercises the edge chroma blocks
    paths = []
    for i in range(3):
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        img = np.stack(
            [96 + xx + i, 104 + yy // 2, 100 + (xx + yy) // 3], -1
        ).clip(64, 192).astype(np.uint8)
        p = str(tmp_path / f"f{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)

    rgb = decode_jpeg_batch(paths, h, w)
    out = decode_jpeg_batch_yuv(paths, h, w)
    if rgb is None or out is None:
        pytest.skip("native libjpeg unavailable")
    y, cbcr = out
    assert y.shape == (3, h, w) and cbcr.shape == (3, 19, 27, 2)
    y_ref, cbcr_ref = rgb_to_yuv420(rgb)
    assert np.abs(y.astype(int) - y_ref.astype(int)).max() <= 2
    assert np.abs(cbcr.astype(int) - cbcr_ref.astype(int)).max() <= 3


def test_rgb_to_yuv420_odd_sizes():
    rgb = np.random.RandomState(2).randint(0, 256, (2, 7, 9, 3), np.uint8)
    y, cbcr = rgb_to_yuv420(rgb)
    assert y.shape == (2, 7, 9) and cbcr.shape == (2, 4, 5, 2)
    # grey input: y == grey value, chroma == 128 everywhere
    g = np.random.RandomState(3).randint(0, 256, (1, 6, 8), np.uint8)
    y2, c2 = rgb_to_yuv420(np.stack([g, g, g], -1))
    np.testing.assert_array_equal(y2, g)
    assert np.abs(c2.astype(int) - 128).max() <= 1


@pytest.mark.slow  # ~70 s: loader->train-step chain; the numeric yuv tests above stay fast
def test_loader_yuv_chain_and_train_step(tmp_path):
    """Full chain with the real loader: synthetic JPEG corpus -> yuv420 raw
    batches -> jitted train step on a 2-device mesh; and the RGB layout on
    the same corpus compiles a SEPARATE program (pytree structures differ)."""
    from tests.test_e2e_pipeline import corpus_cfg
    from stcat_tpu.data.datasets import VidSTGDataset
    from stcat_tpu.data.loader import Loader
    from stcat_tpu.models import STCATNet
    from stcat_tpu.train.optimizer import make_optimizer
    from stcat_tpu.train.step import (
        create_train_state, init_variables, make_train_step,
    )

    cfg = corpus_cfg(tmp_path, [
        "INPUT.AUG_SCALE", "false", "INPUT.AUG_CROP", "false",
        "TPU.INGEST_LAYOUT", "yuv420",
    ])
    ds = VidSTGDataset(cfg, "train")
    loader = Loader(cfg, ds, global_batch=2, is_train=True, num_workers=1)
    assert loader.raw
    batch, targets, _ = next(iter(loader))
    assert batch.frames_u8 is None
    assert batch.frames_y.dtype == np.uint8
    hs, ws = batch.frames_y.shape[2:]
    assert batch.frames_cbcr.shape[2:] == (hs // 2, ws // 2, 2)

    model = STCATNet(cfg)
    variables = init_variables(cfg, model, jax.random.PRNGKey(0), batch)
    mesh = make_mesh(2)
    tx, _ = make_optimizer(cfg, variables["params"], num_training_steps=4)
    state = create_train_state(cfg, variables, tx)
    step = make_train_step(cfg, model, tx, mesh)
    state, m = step(
        state, shard_batch(batch, mesh), shard_batch(targets, mesh),
        jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(m["loss"]))


def test_bad_layout_rejected(tmp_path):
    from tests.test_e2e_pipeline import corpus_cfg
    from stcat_tpu.data.datasets import VidSTGDataset
    from stcat_tpu.data.loader import Loader

    cfg = corpus_cfg(tmp_path, ["TPU.INGEST_LAYOUT", "nv12"])
    ds = VidSTGDataset(cfg, "train")
    with pytest.raises(ValueError, match="INGEST_LAYOUT"):
        Loader(cfg, ds, global_batch=1, is_train=True, num_workers=1)
