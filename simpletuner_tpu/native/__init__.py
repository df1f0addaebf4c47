"""ctypes bindings for the native data-plane ops (C++ `trainingsample` port).

Builds the shared library on first import when no prebuilt ``.so`` is present
(g++ is part of the baked toolchain).  ctypes calls release the GIL, so the
cache thread pools get true parallel decode+resize like the reference's Rust
`trainingsample` wheel.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "trainingsample.cpp")
_LOCK = threading.Lock()
_lib = None
_build_failed = False


def _so_path() -> str:
    with open(_SRC, "rb") as handle:
        digest = hashlib.sha256(handle.read()).hexdigest()[:12]
    return os.path.join(_DIR, f"libtrainingsample-{digest}.so")


def _build(so_path: str) -> None:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", so_path + ".tmp",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(so_path + ".tmp", so_path)


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _LOCK:
        if _lib is not None or _build_failed:
            return _lib
        so_path = _so_path()
        try:
            if not os.path.exists(so_path):
                _build(so_path)
            lib = ctypes.CDLL(so_path)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            i = ctypes.c_int
            lib.st_resize_u8.argtypes = [u8p, i, i, i, u8p, i, i]
            lib.st_crop_u8.argtypes = [u8p, i, i, i, i, i, u8p, i, i]
            lib.st_u8_to_f32_norm.argtypes = [u8p, ctypes.c_int64, f32p]
            lib.st_resize_crop_u8.argtypes = [u8p, i, i, i, i, i, i, i, u8p, i, i]
            lib.st_abi_version.restype = i
            assert lib.st_abi_version() == 1
            _lib = lib
        except Exception as exc:
            logger.warning("native trainingsample unavailable (%s); using PIL fallback", exc)
            _build_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_u8(image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Lanczos-3 resize of a uint8 (H, W, C) image."""
    lib = _load()
    image = np.ascontiguousarray(image)
    h, w, c = image.shape
    out = np.empty((out_h, out_w, c), np.uint8)
    lib.st_resize_u8(_u8ptr(image), h, w, c, _u8ptr(out), out_h, out_w)
    return out


def crop_u8(image: np.ndarray, top: int, left: int, out_h: int, out_w: int) -> np.ndarray:
    lib = _load()
    image = np.ascontiguousarray(image)
    h, w, c = image.shape
    out = np.empty((out_h, out_w, c), np.uint8)
    lib.st_crop_u8(_u8ptr(image), h, w, c, top, left, _u8ptr(out), out_h, out_w)
    return out


def resize_crop_u8(
    image: np.ndarray, resize_h: int, resize_w: int, top: int, left: int, out_h: int, out_w: int
) -> np.ndarray:
    lib = _load()
    image = np.ascontiguousarray(image)
    h, w, c = image.shape
    out = np.empty((out_h, out_w, c), np.uint8)
    lib.st_resize_crop_u8(
        _u8ptr(image), h, w, c, resize_h, resize_w, top, left, _u8ptr(out), out_h, out_w
    )
    return out


def to_f32_normalized(image: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1] (VAE input convention), fused in C++."""
    lib = _load()
    image = np.ascontiguousarray(image)
    out = np.empty(image.shape, np.float32)
    lib.st_u8_to_f32_norm(
        _u8ptr(image), image.size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    return out
