"""Native (C++) lifting kernels with ctypes bindings.

The shared library is built on demand with g++ (cached next to the source);
all callers fall back to the pure-Python implementations if the toolchain
or binary is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "lift.cpp")
_LIB = os.path.join(_DIR, "libcwnlift.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it if needed; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.find_induced_cycles.restype = ctypes.c_int64
            lib.find_induced_cycles.argtypes = [
                ctypes.c_int32, ctypes.c_int64,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                ctypes.c_int64,
            ]
            _lib = lib
            return _lib
        except OSError:
            _build_failed = True
            return None


def native_find_induced_cycles(edge_index, num_vertices: int, max_k: int
                               ) -> Optional[List[Tuple[int, ...]]]:
    """Native chordless-cycle enumeration; None if the library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    edge_index = np.asarray(edge_index)
    eu = np.ascontiguousarray(edge_index[0], dtype=np.int32)
    ev = np.ascontiguousarray(edge_index[1], dtype=np.int32)
    cap = max(1024, 16 * num_vertices)
    while True:
        out = np.empty(cap, np.int32)
        needed = lib.find_induced_cycles(
            np.int32(num_vertices), np.int64(len(eu)), eu, ev,
            np.int32(max_k), out, np.int64(cap))
        if needed < 0:
            return None
        if needed <= cap:
            break
        cap = int(needed)
    rings = []
    pos = 0
    while pos < needed:
        length = int(out[pos])
        rings.append(tuple(int(v) for v in out[pos + 1: pos + 1 + length]))
        pos += 1 + length
    return rings
