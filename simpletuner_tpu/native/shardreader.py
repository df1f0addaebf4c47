"""ctypes bindings for the C++ tar shard reader (webshart equivalent)."""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from typing import Dict, List, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "shardreader.cpp")
_LOCK = threading.Lock()
_lib = None
_failed = False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _LOCK:
        if _lib is not None or _failed:
            return _lib
        try:
            with open(_SRC, "rb") as handle:
                digest = hashlib.sha256(handle.read()).hexdigest()[:12]
            so_path = os.path.join(_DIR, f"libshardreader-{digest}.so")
            if not os.path.exists(so_path):
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", so_path + ".tmp"],
                    check=True, capture_output=True,
                )
                os.replace(so_path + ".tmp", so_path)
            lib = ctypes.CDLL(so_path)
            lib.st_tar_index.restype = ctypes.c_int64
            lib.st_tar_index.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64]
            lib.st_pread.restype = ctypes.c_int64
            lib.st_pread.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
            ]
            assert lib.st_shard_abi_version() == 1
            _lib = lib
        except Exception as exc:
            logger.warning("shard reader unavailable (%s); tar shards use python tarfile", exc)
            _failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def index_tar(path: str) -> List[Tuple[str, int, int]]:
    """[(member_name, payload_offset, size)] for every regular file in the tar."""
    lib = _load()
    if lib is None:  # pure-python fallback
        import tarfile

        out = []
        with tarfile.open(path) as tar:
            for member in tar:
                if member.isreg():
                    out.append((member.name, member.offset_data, member.size))
        return out
    cap = 1 << 20
    while True:
        buf = ctypes.create_string_buffer(cap)
        n = lib.st_tar_index(path.encode(), buf, cap)
        if n == -1:
            raise IOError(f"cannot index tar {path}")
        if n < 0:
            cap = -n + 1024
            continue
        break
    entries = []
    for line in buf.raw[:n].decode(errors="replace").splitlines():
        name, offset, size = line.rsplit("\t", 2)
        entries.append((name, int(offset), int(size)))
    return entries


def read_member(path: str, offset: int, size: int) -> bytes:
    lib = _load()
    if lib is None:
        with open(path, "rb") as handle:
            handle.seek(offset)
            return handle.read(size)
    out = np.empty(size, np.uint8)
    got = lib.st_pread(
        path.encode(), offset, size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    )
    if got != size:
        raise IOError(f"short read from {path} at {offset}: {got}/{size}")
    return out.tobytes()
