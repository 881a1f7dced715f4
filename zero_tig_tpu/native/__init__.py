"""Native (C++) runtime components, loaded via ctypes.

``frameio``: libpng/libjpeg frame decoding + bicubic resize + normalization
+ an ordered multi-threaded prefetch pipeline -- the native-runtime
equivalent of the reference's blocking PIL data path. Built on first use
with g++ (cached as libframeio.so next to the source); every consumer falls
back to the OpenCV path when the toolchain or libraries are unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libframeio.so")
_SRC = os.path.join(_DIR, "frameio.cc")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None

MODE_BILINEAR = 0
MODE_BICUBIC = 1


def _build() -> str | None:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", _SO, "-lpng", "-ljpeg", "-lpthread",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired) as e:
        return str(e)
    if res.returncode != 0:
        return res.stderr[-2000:]
    return None


def get_lib():
    """The loaded ctypes library, or None (with availability reason)."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            err = _build()
            if err:
                _build_error = err
                return None
        lib = ctypes.CDLL(_SO)
        lib.frameio_load.restype = ctypes.c_int
        lib.frameio_load.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.frameio_pipeline_create.restype = ctypes.c_void_p
        lib.frameio_pipeline_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.frameio_pipeline_next.restype = ctypes.c_int
        lib.frameio_pipeline_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ]
        lib.frameio_pipeline_destroy.argtypes = [ctypes.c_void_p]
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        lib.frameio_load_u8.restype = ctypes.c_int
        lib.frameio_load_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
        ]
        lib.frameio_pipeline_create_u8.restype = ctypes.c_void_p
        lib.frameio_pipeline_create_u8.argtypes = (
            lib.frameio_pipeline_create.argtypes
        )
        lib.frameio_pipeline_next_u8.restype = ctypes.c_int
        lib.frameio_pipeline_next_u8.argtypes = [ctypes.c_void_p, u8p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def build_error() -> str | None:
    return _build_error


def load_frame(
    path: str, width: int, height: int, *, mode: int = MODE_BICUBIC
) -> np.ndarray:
    """Decode + resize + normalize one frame natively -> (H, W, 3) f32."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native frameio unavailable: {_build_error}")
    out = np.empty((height, width, 3), np.float32)
    rc = lib.frameio_load(
        path.encode(), width, height, mode,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"native decode failed: {path}")
    return out


def load_frame_u8(
    path: str, width: int, height: int, *, mode: int = MODE_BICUBIC
) -> np.ndarray:
    """Decode + resize one frame natively -> (H, W, 3) uint8 RGB.

    Composes with device_prefetch(transfer_uint8=True): the relay's float
    H2D path is ~100x slower (BASELINE.md), which made the float-only
    native loader unusable through the relay in round 2. Frames already at
    target size are a straight memcpy of the decoded bytes."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native frameio unavailable: {_build_error}")
    out = np.empty((height, width, 3), np.uint8)
    rc = lib.frameio_load_u8(
        path.encode(), width, height, mode,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc != 0:
        raise IOError(f"native decode failed: {path}")
    return out


class NativePipeline:
    """Ordered multi-threaded decode pipeline over a fixed path list.

    out_u8=True yields (H, W, 3) uint8 frames (the relay-friendly transfer
    format); default yields float32 [0, 1]."""

    def __init__(
        self,
        paths: list[str],
        width: int,
        height: int,
        *,
        mode: int = MODE_BICUBIC,
        threads: int = 4,
        capacity: int = 8,
        out_u8: bool = False,
    ):
        lib = get_lib()
        if lib is None:
            raise RuntimeError(f"native frameio unavailable: {_build_error}")
        self._lib = lib
        self._u8 = bool(out_u8)
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        create = (
            lib.frameio_pipeline_create_u8 if out_u8
            else lib.frameio_pipeline_create
        )
        self._handle = create(
            arr, len(self._paths), width, height, mode, threads, capacity
        )
        self.width, self.height = width, height
        self._n = len(paths)
        self._i = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._i >= self._n:
            raise StopIteration
        if self._u8:
            out = np.empty((self.height, self.width, 3), np.uint8)
            rc = self._lib.frameio_pipeline_next_u8(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            )
        else:
            out = np.empty((self.height, self.width, 3), np.float32)
            rc = self._lib.frameio_pipeline_next(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        self._i += 1
        if rc == 2:
            raise StopIteration
        if rc != 0:
            raise IOError(f"native decode failed at index {self._i - 1}")
        return out

    def close(self):
        if self._handle:
            self._lib.frameio_pipeline_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
