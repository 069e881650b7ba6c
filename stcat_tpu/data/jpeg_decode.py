"""ctypes binding for the native JPEG batch decoder (native/jpegpool.cc).

Decodes a clip's frame files straight into one preallocated uint8 array with
libjpeg-turbo, outside the GIL (~4x faster per frame than PIL on this image,
measured 0.77 ms vs 3.4 ms at 320x240). Built on first use with g++ against
the system libjpeg; decode.load_frame_images falls back to PIL when the
library or a decode fails.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "jpegpool.cc")
_LIB = os.path.join(os.path.dirname(__file__), "..", "native", "libjpegpool.so")
_build_lock = threading.Lock()
_lib_handle = None
_lib_failed = False


def _build_library() -> Optional[str]:
    src, lib = os.path.abspath(_SRC), os.path.abspath(_LIB)
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    with _build_lock:
        if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
            return lib
        try:
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-shared", src, "-o", lib,
                 "-ljpeg", "-lpthread"],
                check=True, capture_output=True, timeout=240,
            )
            return lib
        except Exception:
            return None


def load_library():
    global _lib_handle, _lib_failed
    if _lib_handle is not None or _lib_failed:
        return _lib_handle
    path = _build_library()
    if path is None:
        _lib_failed = True
        return None
    lib = ctypes.CDLL(path)
    lib.jp_decode_batch.restype = ctypes.c_long
    lib.jp_decode_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long, ctypes.c_long, ctypes.c_long,
    ]
    lib.jp_decode_batch_yuv.restype = ctypes.c_long
    lib.jp_decode_batch_yuv.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long, ctypes.c_long, ctypes.c_long,
    ]
    _lib_handle = lib
    return lib


def available() -> bool:
    return load_library() is not None


def decode_jpeg_batch(
    paths: List[str], h: int, w: int, workers: int = 2
) -> Optional[np.ndarray]:
    """uint8 [len(paths), h, w, 3], or None if the native path can't decode
    (missing library, corrupt file, or dimension mismatch -- caller falls
    back to PIL)."""
    lib = load_library()
    if lib is None:
        return None
    out = np.empty((len(paths), h, w, 3), np.uint8)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    failures = lib.jp_decode_batch(
        blob, len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, workers,
    )
    if failures:
        return None
    return out


def decode_jpeg_batch_yuv(
    paths: List[str], h: int, w: int, workers: int = 2
) -> Optional[tuple]:
    """4:2:0 decode: (y [n, h, w], cbcr [n, ceil(h/2), ceil(w/2), 2]) uint8,
    or None (caller falls back to PIL + host subsample). JPEGs store YCbCr,
    so this is the codec's native layout at half the bytes of RGB."""
    lib = load_library()
    if lib is None:
        return None
    n = len(paths)
    hc, wc = (h + 1) // 2, (w + 1) // 2
    y = np.empty((n, h, w), np.uint8)
    cbcr = np.empty((n, hc, wc, 2), np.uint8)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    failures = lib.jp_decode_batch_yuv(
        blob, n,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cbcr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, workers,
    )
    if failures:
        return None
    return y, cbcr
