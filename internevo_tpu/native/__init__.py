"""Native (C++) data-path kernels with transparent build + Python fallback.

``fastpack.so`` is compiled on first use with g++ (cached next to the source);
if the toolchain is unavailable every entry point falls back to numpy/json.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastpack.cpp")
_SO = os.path.join(_HERE, "fastpack.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.parse_tokens.restype = ctypes.c_long
            lib.parse_tokens.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                         ctypes.POINTER(ctypes.c_int32), ctypes.c_long]
            lib.build_meta.restype = ctypes.c_long
            lib.build_meta.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                       ctypes.POINTER(ctypes.c_int64),
                                       ctypes.POINTER(ctypes.c_int64), ctypes.c_long]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def parse_tokens_line(line: bytes) -> np.ndarray:
    """{"tokens": [...]} line -> int32 array (C++ fast path, json fallback)."""
    lib = _load()
    if lib is not None:
        max_out = max(16, len(line) // 2)
        out = np.empty(max_out, np.int32)
        n = lib.parse_tokens(line, len(line),
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_out)
        if n >= 0:
            return out[:n].copy()
    return np.asarray(json.loads(line)["tokens"], np.int32)


def build_meta_from_bytes(buf: bytes) -> np.ndarray:
    """Whole .bin contents -> (rows, 2) int64 array of (offset, token_count)."""
    lib = _load()
    if lib is not None:
        max_rows = buf.count(b"\n") + 2
        offsets = np.empty(max_rows, np.int64)
        counts = np.empty(max_rows, np.int64)
        rows = lib.build_meta(buf, len(buf),
                              offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                              counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                              max_rows)
        if rows >= 0:
            return np.stack([offsets[:rows], counts[:rows]], axis=1)
    # python fallback
    meta = []
    pos = 0
    for line in buf.splitlines(keepends=True):
        stripped = line.strip()
        if stripped:
            meta.append((pos, len(json.loads(stripped)["tokens"])))
        pos += len(line)
    return np.asarray(meta, np.int64).reshape(-1, 2)


def prepare_meta_fast(bin_path: str) -> None:
    """Build the .bin.meta next to the file (native build_meta)."""
    with open(bin_path, "rb") as f:
        buf = f.read()
    meta = build_meta_from_bytes(buf)
    with open(bin_path + ".meta", "wb") as f:
        np.save(f, meta)


def native_available() -> bool:
    return _load() is not None
