"""On-device input preprocessing (ops/preprocess.py) vs the host float path.

Claims verified:
  - box/actioness targets are bit-identical across the two modes (the plan
    does the reference box math on host either way);
  - the device resampler equals an exact host bilinear resample along the
    plan's composed affine (clamped edge taps, half-pixel centers) for every
    augmentation branch, flipped or not;
  - for single-resize plans (the eval path and the no-crop train branch)
    that affine resample IS the reference chain, so device == host-chain to
    float tolerance. The resize->crop->resize branch composes two stacked
    bilinears into one resample -- an augmentation-only smoothing deviation
    (large on pure-noise pixels, irrelevant distributionally), so there the
    host-chain comparison is only sanity-loose.
"""

import numpy as np
import pytest

import jax

from stcat_tpu.config import default_config, merge_from_list
from stcat_tpu.data.batching import build_batch, build_raw_batch, pick_bucket
from stcat_tpu.data.synthetic import make_synthetic_dataset
from stcat_tpu.data.tokenize import build_tokenizer
from stcat_tpu.ops.preprocess import preprocess

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def host_affine_resample(frames_u8, flip, affine, out_hw):
    """Exact reference for the device resampler: bilinear sample of
    y_src = ay*y + by / x_src = ax*x + bx with edge-clamped taps."""
    f = frames_u8[:, :, ::-1] if flip else frames_u8
    f = np.asarray(f, np.float32) / 255.0
    t, h, w, c = f.shape
    ay, by, ax, bx = affine

    def taps(n_out, a, b, n_in):
        src = a * np.arange(n_out, dtype=np.float64) + b
        lo = np.floor(src).astype(np.int64)
        frac = (src - lo).astype(np.float32)
        return np.clip(lo, 0, n_in - 1), np.clip(lo + 1, 0, n_in - 1), frac

    y0, y1, fy = taps(out_hw[0], ay, by, h)
    x0, x1, fx = taps(out_hw[1], ax, bx, w)
    top, bot = f[:, y0], f[:, y1]
    fr = top + (bot - top) * fy[None, :, None, None]
    left, right = fr[:, :, x0], fr[:, :, x1]
    out = left + (right - left) * fx[None, None, :, None]
    return (out - np.asarray(MEAN, np.float32)) / np.asarray(STD, np.float32)


def tiny_cfg(extra=(), res=64):
    return merge_from_list(
        default_config(),
        [
            "INPUT.RESOLUTION", str(res), "INPUT.TRAIN_SAMPLE_NUM", "6",
            "INPUT.MAX_QUERY_LEN", "12", "TPU.FRAME_BUCKETS", "[8]",
            "DATASET.NAME", "VidSTG",
        ]
        + list(extra),
    )


def _pair(cfg, data_dir, split, index, seed):
    """(legacy_sample, raw_sample) drawn with identical rng streams."""
    ds = make_synthetic_dataset(
        merge_from_list(cfg, ["DATA_DIR", data_dir]), split, n_items=4, n_frames=12
    )
    legacy = ds.__getitem__(index, rng=np.random.default_rng(seed))
    raw = ds.__getitem__(index, rng=np.random.default_rng(seed), raw=True)
    return legacy, raw


def _run(cfg, legacy, raw):
    tok = build_tokenizer(cfg)
    t_bucket = pick_bucket(len(legacy["actioness"]), cfg.TPU.FRAME_BUCKETS)
    vb, vt, _ = build_batch([legacy], t_bucket, tok, cfg.INPUT.MAX_QUERY_LEN)
    rb, rt, _ = build_raw_batch([raw], t_bucket, tok, cfg.INPUT.MAX_QUERY_LEN)
    got = jax.jit(lambda r: preprocess(r, MEAN, STD))(rb)
    return vb, vt, got, rt


def _check(legacy, raw, vb, vt, got, rt):
    np.testing.assert_array_equal(np.asarray(got.pixel_valid), vb.pixel_valid)
    np.testing.assert_array_equal(np.asarray(got.frame_valid), vb.frame_valid)
    for a, b in zip(jax.tree_util.tree_leaves(vt), jax.tree_util.tree_leaves(rt)):
        np.testing.assert_array_equal(a, b)  # targets bit-identical
    assert raw["text"] == legacy["text"]

    plan = raw["plan"]
    oh, ow = plan.out_hw
    t = raw["frames_u8"].shape[0]
    gf = np.asarray(got.frames)[0, :t, :oh, :ow]
    hf = vb.frames[0, :t, :oh, :ow]

    # strict: device == exact affine resample (validates flip offsets,
    # canvas padding, replicate rows, scale_and_translate conventions)
    ref = host_affine_resample(raw["frames_u8"], plan.flip, plan.affine, (oh, ow))
    np.testing.assert_allclose(gf, ref, atol=5e-4, rtol=0)

    multi = sum(op[0] == "resize" for op in plan.ops) > 1 or any(
        op[0] == "crop" for op in plan.ops
    )
    if multi:
        # stacked-vs-composed bilinear: augmentation-only smoothing diff
        assert np.mean(np.abs(gf - hf)) < 0.12, np.mean(np.abs(gf - hf))
    else:
        np.testing.assert_allclose(gf, hf, atol=5e-4, rtol=0)


def test_eval_path_matches_host_exactly(tmp_path):
    cfg = tiny_cfg()
    legacy, raw = _pair(cfg, str(tmp_path), "test", 1, seed=7)
    assert all(op[0] == "resize" for op in raw["plan"].ops)
    _check(legacy, raw, *_run(cfg, legacy, raw))


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_train_aug_paths(tmp_path, seed):
    # resolution high enough that the RandomSizeCrop branch (min 384) fires
    cfg = tiny_cfg(res=416)
    legacy, raw = _pair(cfg, str(tmp_path), "train", seed % 4, seed=seed)
    assert raw["plan"].out_hw == legacy["frames"].shape[1:3]
    _check(legacy, raw, *_run(cfg, legacy, raw))


def test_flip_geometry(tmp_path):
    """flip_prob=1 exercises the canvas-flip offset fold in build_raw_batch."""
    cfg = tiny_cfg(["INPUT.FLIP_PROB_TRAIN", "1.0", "INPUT.AUG_SCALE", "false"])
    legacy, raw = _pair(cfg, str(tmp_path), "train", 0, seed=11)
    assert raw["plan"].flip
    _check(legacy, raw, *_run(cfg, legacy, raw))
