"""ctypes bindings for the C++ frame-decode pipe pool (native/framepool.cc).

Builds the shared library on first use (g++, cached next to the source) and
exposes a FramePool whose submit/collect overlap ffmpeg decode with Python
transform work WITHOUT holding the GIL for the pipe drain. The Loader uses it
when available; the pure-Python decode path (decode.py) remains the fallback.
"""

from __future__ import annotations

import ctypes
import os
import shlex
import subprocess
import threading
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "framepool.cc")
_LIB = os.path.join(os.path.dirname(__file__), "..", "native", "libframepool.so")
_build_lock = threading.Lock()


def _build_library() -> Optional[str]:
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB)
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    with _build_lock:
        if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
            return lib
        try:
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-shared", src, "-o", lib, "-lpthread"],
                check=True, capture_output=True, timeout=240,
            )
            return lib
        except Exception:
            return None


_lib_handle = None


def load_library():
    global _lib_handle
    if _lib_handle is not None:
        return _lib_handle
    path = _build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.fp_create.restype = ctypes.c_void_p
    lib.fp_create.argtypes = [ctypes.c_int]
    lib.fp_submit.restype = ctypes.c_long
    lib.fp_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long]
    lib.fp_wait.restype = ctypes.c_long
    lib.fp_wait.argtypes = [
        ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.fp_release.argtypes = [ctypes.c_void_p, ctypes.c_long]
    lib.fp_destroy.argtypes = [ctypes.c_void_p]
    _lib_handle = lib
    return lib


def available() -> bool:
    return load_library() is not None


class FramePool:
    """Submit shell pipelines producing raw bytes; collect numpy views."""

    def __init__(self, workers: int = 4):
        self._lib = load_library()
        if self._lib is None:
            raise RuntimeError("native framepool unavailable (g++ build failed)")
        self._pool = self._lib.fp_create(workers)

    def submit(self, cmd: str, max_bytes: int) -> int:
        ticket = self._lib.fp_submit(self._pool, cmd.encode(), max_bytes)
        if ticket < 0:
            raise RuntimeError("fp_submit failed")
        return ticket

    def collect(self, ticket: int, copy: bool = True) -> bytes:
        ptr = ctypes.POINTER(ctypes.c_uint8)()
        size = ctypes.c_long()
        rc = self._lib.fp_wait(self._pool, ticket, ctypes.byref(ptr), ctypes.byref(size))
        if rc == -2:
            self._lib.fp_release(self._pool, ticket)
            raise RuntimeError("decode command produced no data")
        data = np.ctypeslib.as_array(ptr, shape=(size.value,))
        out = data.copy() if copy else data
        self._lib.fp_release(self._pool, ticket)
        if rc == -3:
            # nonzero exit but bytes were produced; caller validates length
            pass
        return out

    def close(self):
        if self._pool:
            self._lib.fp_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def ffmpeg_command(path: str, frame_ids: List[int]) -> str:
    """Shell pipeline decoding exactly frame_ids to raw rgb24 on stdout."""
    wanted = sorted(set(int(f) for f in frame_ids))
    sel = "+".join(f"eq(n\\,{f})" for f in wanted)
    vf = f"trim=end_frame={wanted[-1] + 1},select='{sel}'"
    return (
        f"ffmpeg -v error -i {shlex.quote(path)} -vf {shlex.quote(vf)} "
        f"-vsync 0 -f rawvideo -pix_fmt rgb24 pipe:"
    )


def decode_frames_native(
    pool: FramePool, path: str, frame_ids: List[int], h: int, w: int
) -> np.ndarray:
    """Decode via the native pool. Returns uint8 [len(frame_ids), h, w, 3]."""
    wanted = sorted(set(int(f) for f in frame_ids))
    nbytes = len(wanted) * h * w * 3
    ticket = pool.submit(ffmpeg_command(path, frame_ids), nbytes)
    raw = pool.collect(ticket)
    if raw.size != nbytes:
        raise RuntimeError(f"native decode got {raw.size} bytes, want {nbytes}")
    frames = raw.reshape(len(wanted), h, w, 3)
    order = {f: i for i, f in enumerate(wanted)}
    return frames[[order[int(f)] for f in frame_ids]]
