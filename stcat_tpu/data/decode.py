"""Video frame decode: FFmpeg subprocess -> raw RGB, host-side.

The reference decodes the ENTIRE mp4 and then slices the wanted frames
(datasets/vidstg.py:112-152) -- the single biggest input-pipeline cost. Here
the default path decodes only the needed span with an ffmpeg select/trim
filter (typically 2-20x less decode work for VidSTG segments), with the
whole-video pipe as fallback, both retried (ref retries 20x).

Frame-directory loading (img_00001.jpg) is supported as in the reference's
load_video=False path (vidstg.py:143-150).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import List

import numpy as np

FFMPEG = shutil.which("ffmpeg")


class DecodeError(RuntimeError):
    pass


def _run_ffmpeg(args: List[str]) -> bytes:
    proc = subprocess.run(
        [FFMPEG, "-v", "error", *args, "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:"],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        check=False,
    )
    if proc.returncode != 0:
        raise DecodeError(proc.stderr.decode()[:500])
    return proc.stdout


def decode_all_frames(path: str, h: int, w: int, retries: int = 20) -> np.ndarray:
    """Whole-video decode (ref behavior). Returns uint8 [N, h, w, 3]."""
    if FFMPEG is None:
        raise DecodeError("ffmpeg binary not available")
    last = None
    for _ in range(retries):
        try:
            out = _run_ffmpeg(["-i", path])
            return np.frombuffer(out, np.uint8).reshape([-1, h, w, 3])
        except DecodeError as e:  # transient IO / container hiccups
            last = e
    raise DecodeError(f"Load Video Error: {path}: {last}")


def decode_frames(
    path: str, frame_ids: List[int], h: int, w: int, retries: int = 20
) -> np.ndarray:
    """Decode exactly the requested frames. Returns uint8 [len(frame_ids), h, w, 3].

    Uses a trim+select filter so ffmpeg stops at the last wanted frame and
    emits only wanted ones; falls back to whole-video decode.
    """
    if FFMPEG is None:
        raise DecodeError("ffmpeg binary not available")
    wanted = sorted(set(int(f) for f in frame_ids))
    first, last_f = wanted[0], wanted[-1]
    sel = "+".join(f"eq(n\\,{f})" for f in wanted)
    vf = f"trim=end_frame={last_f + 1},select='{sel}'"
    try:
        out = _run_ffmpeg(["-i", path, "-vf", vf, "-vsync", "0"])
        frames = np.frombuffer(out, np.uint8).reshape([-1, h, w, 3])
        if frames.shape[0] == len(wanted):
            order = {f: i for i, f in enumerate(wanted)}
            return frames[[order[int(f)] for f in frame_ids]]
    except DecodeError:
        pass
    # fallback: reference-style whole decode + slice
    frames = decode_all_frames(path, h, w, retries=retries)
    return frames[np.asarray(frame_ids)]


def load_frame_images(
    frame_dir: str, vid: str, frame_ids: List[int], hw=None
) -> np.ndarray:
    """Read img_{fid:05d}.jpg frames. ref vidstg.py:143-150.

    Fast path: the native libjpeg-turbo batch decoder (data/jpeg_decode.py),
    GIL-free and ~4x faster than PIL; needs the expected (h, w) to size the
    output buffer. PIL is the fallback (and the shape oracle when hw=None).
    """
    paths = [
        os.path.join(frame_dir, vid, f"img_{fid:05d}.jpg") for fid in frame_ids
    ]
    if hw is not None:
        from .jpeg_decode import decode_jpeg_batch

        out = decode_jpeg_batch(paths, int(hw[0]), int(hw[1]))
        if out is not None:
            return out
    from PIL import Image

    return np.stack([np.asarray(Image.open(p).convert("RGB")) for p in paths])
