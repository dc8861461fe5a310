"""On-demand g++ build + ctypes loader for the native library.

The shared object is compiled once per source hash into
``~/.cache/gssd_tpu`` (or $GSSD_NATIVE_CACHE) and memoized in-process.
``load_native()`` returns None when no toolchain is available — callers
fall back to numpy implementations.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SOURCES = ["pixellink_cc.cpp", "eval_sweep.cpp"]


def _src_dir() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        srcs = [
            os.path.join(_src_dir(), s)
            for s in _SOURCES
            if os.path.exists(os.path.join(_src_dir(), s))
        ]
        if not srcs:
            return None
        h = hashlib.sha256()
        for s in srcs:
            with open(s, "rb") as f:
                h.update(f.read())
        cache = os.environ.get(
            "GSSD_NATIVE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "gssd_tpu"),
        )
        os.makedirs(cache, exist_ok=True)
        so_path = os.path.join(cache, f"libgssd_native_{h.hexdigest()[:16]}.so")
        if not os.path.exists(so_path):
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", so_path] + srcs
            try:
                subprocess.run(cmd, check=True, capture_output=True)
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                print(f"WARNING: native build failed ({e}); using numpy "
                      "fallbacks")
                return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None
        lib.pixellink_components.restype = ctypes.c_int32
        lib.pixellink_components.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        if hasattr(lib, "eval_sweep"):
            lib.eval_sweep.restype = None
            lib.eval_sweep.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double), ctypes.c_double,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
            ]
        _LIB = lib
        return _LIB
