"""Single-clip inference CLI (stcat_tpu/cli/infer.py): files in, tube out.

Drives run() in-process on a materialized synthetic frame dir (the same
image layout the datasets' frame-dir decode branch reads) and on a .npy
clip; asserts the tube schema, original-pixel coordinates, span sanity,
the --draw rendering, and the off-happy-path errors (empty dir, bad npy
shape)."""

import argparse
import json
import os

import numpy as np
import pytest

from helpers import tiny_cfg
from stcat_tpu.cli.infer import load_frames, run
from stcat_tpu.core.logging import setup_logger


def _args(**kw):
    base = dict(config_file="", frames="", query="", weights="", out="",
                draw="", stride=1, opts=None)
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def cfg():
    return tiny_cfg([
        "INPUT.RESOLUTION", 64,
        "INPUT.MAX_QUERY_LEN", 8,
        "TPU.FRAME_BUCKETS", "[8]",
    ])


@pytest.fixture(scope="module")
def frame_dir(tmp_path_factory):
    """A synthetic clip materialized as JPEGs (dataset frame-dir layout)."""
    from stcat_tpu.data.synthetic import render_frames

    d = tmp_path_factory.mktemp("clip")
    item = {
        "vid": "x", "height": 48, "width": 64, "gt_temp_bound": [2, 6],
        "bboxs": [[10.0, 8.0, 30.0, 28.0]] * 5, "frame_ids": list(range(10)),
    }
    frames = render_frames(item, range(10))
    from PIL import Image

    for i in range(10):
        Image.fromarray(frames[i]).save(d / f"img_{i:05d}.jpg", quality=92)
    return str(d)


def test_load_frames_dir_and_stride(frame_dir):
    frames, ids = load_frames(frame_dir)
    assert frames.shape == (10, 48, 64, 3) and frames.dtype == np.uint8
    assert ids == list(range(10))
    f2, ids2 = load_frames(frame_dir, stride=2)
    assert f2.shape[0] == 5 and ids2 == [0, 2, 4, 6, 8]


@pytest.mark.slow  # >13 s on the 1-core CI host; fast-gate budget (verdict r5 task 3)
def test_infer_on_frame_dir(cfg, frame_dir, tmp_path):
    logger = setup_logger("infer-test", rank=0)
    out = str(tmp_path / "tube.json")
    draw = str(tmp_path / "drawn")
    tube = run(cfg, _args(frames=frame_dir, query="the bright square moves",
                          out=out, draw=draw), logger)
    assert set(tube) == {"query", "span", "boxes", "frame_ids"}
    # every input frame id gets a box, in original (64x48) pixels
    assert sorted(tube["boxes"]) == list(range(10))
    for box in tube["boxes"].values():
        x0, y0, x1, y1 = box
        assert 0 <= x0 <= x1 <= 64 and 0 <= y0 <= y1 <= 48, box
    s, e = tube["span"]
    assert 0 <= s < e <= 10
    on_disk = json.load(open(out))
    assert on_disk["span"] == tube["span"]
    drawn = os.listdir(draw)
    assert len(drawn) == e - s and all(f.startswith("tube_") for f in drawn)


@pytest.mark.slow  # second predictor compile; the frame-dir test covers the chain
def test_infer_on_npy(cfg, tmp_path):
    logger = setup_logger("infer-test", rank=0)
    rng = np.random.RandomState(0)
    clip = rng.randint(0, 255, size=(9, 40, 56, 3), dtype=np.uint8)
    p = str(tmp_path / "clip.npy")
    np.save(p, clip)
    tube = run(cfg, _args(frames=p, query="a dog jumps"), logger)
    assert sorted(tube["boxes"]) == list(range(9))


def test_load_frames_errors(tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit):
        load_frames(str(empty))
    bad = tmp_path / "bad.npy"
    np.save(str(bad), np.zeros((4, 8, 8), np.uint8))
    with pytest.raises(SystemExit):
        load_frames(str(bad))


def test_load_frames_npy_dtypes(tmp_path):
    """Non-uint8 .npy input must be rescaled ([0,1] floats) or rejected --
    never silently truncated to 0/1 pixels."""
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, size=(3, 8, 8, 3), dtype=np.uint8)

    f01 = tmp_path / "f01.npy"
    np.save(str(f01), u8.astype(np.float32) / 255.0)
    frames, ids = load_frames(str(f01))
    assert frames.dtype == np.uint8 and ids == [0, 1, 2]
    assert np.abs(frames.astype(int) - u8.astype(int)).max() <= 1  # round-trip

    f255 = tmp_path / "f255.npy"
    np.save(str(f255), u8.astype(np.float32))  # floats OUTSIDE [0,1]
    with pytest.raises(SystemExit):
        load_frames(str(f255))

    i32 = tmp_path / "i32.npy"
    np.save(str(i32), u8.astype(np.int32))
    with pytest.raises(SystemExit):
        load_frames(str(i32))


def test_setup_logger_stream_retarget(capsys):
    """An explicit stream must win even when the named logger was configured
    earlier in-process (infer's stdout-stays-JSON guarantee)."""
    import sys as _sys

    name = "stream-retarget-test"
    lg = setup_logger(name, rank=0)  # defaults to stdout
    lg.info("to-stdout")
    lg2 = setup_logger(name, rank=0, stream=_sys.stderr)
    assert lg2 is lg
    lg2.info("to-stderr")
    cap = capsys.readouterr()
    assert "to-stdout" in cap.out and "to-stderr" not in cap.out
    assert "to-stderr" in cap.err
