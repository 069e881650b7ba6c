"""Native C++ frame-pool: build, submit shell pipelines, collect bytes."""

import shutil

import numpy as np
import pytest

from stcat_tpu.data import native_decode

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


def test_build_and_roundtrip():
    assert native_decode.available(), "libframepool failed to build"
    pool = native_decode.FramePool(workers=2)
    try:
        # deterministic byte generators instead of ffmpeg
        t1 = pool.submit("printf 'abcdef'", 6)
        t2 = pool.submit("head -c 1000 /dev/zero", 1000)
        out1 = pool.collect(t1)
        out2 = pool.collect(t2)
        assert bytes(out1) == b"abcdef"
        assert out2.size == 1000 and not out2.any()
    finally:
        pool.close()


def test_parallel_jobs_complete():
    pool = native_decode.FramePool(workers=4)
    try:
        n = 16
        tickets = [
            pool.submit(f"printf '%0{i + 1}d' 7", i + 1) for i in range(n)
        ]
        for i, t in enumerate(tickets):
            out = pool.collect(t)
            assert out.size == i + 1, (i, out.size)
    finally:
        pool.close()


def test_short_output_raises_in_decode_wrapper(tmp_path):
    pool = native_decode.FramePool(workers=1)
    try:
        with pytest.raises(RuntimeError):
            native_decode.decode_frames_native(
                pool, "/nonexistent.mp4", [0, 1], 4, 4
            )
    finally:
        pool.close()


def test_ffmpeg_command_shape():
    cmd = native_decode.ffmpeg_command("/a b/v.mp4", [3, 1, 1])
    assert "'/a b/v.mp4'" in cmd
    assert "eq(n\\,1)+eq(n\\,3)" in cmd
    assert "end_frame=4" in cmd
