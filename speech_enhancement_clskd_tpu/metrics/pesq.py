"""PESQ wideband MOS-LQO — ctypes binding to the native C++ implementation.

The reference called the ``pesq`` pip package (ITU P.862 C code; reference
tools_for_model.py:587-592).  Here the metric is our own C++ implementation
(``native/pesq.cc``): P.862 pipeline (level align, delay compensation, Bark
loudness, symmetric/asymmetric disturbance, L6/L2 aggregation, P.862.2
wideband MOS-LQO mapping) with *computed* Bark tables — P.862-like, monotone,
MOS-scaled, but not bit-exact vs the ITU reference.

The shared library is built on first use with g++ (cached under
native/build/).  ``pesq_wb`` is the host-side scalar metric; it is NOT used in
any jit path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libpesq.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> ctypes.CDLL:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            raise ImportError("native pesq build failed earlier")
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-s", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception as e:  # g++/make missing or compile error
                _build_failed = True
                raise ImportError(f"could not build native pesq: {e}") from e
        lib = ctypes.CDLL(_LIB_PATH)
        lib.pesq_mos.restype = ctypes.c_double
        lib.pesq_mos.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
        return lib


def pesq_wb(ref: np.ndarray, deg: np.ndarray, sample_rate: int = 16000) -> float:
    """Wideband PESQ MOS-LQO of degraded vs reference ([T] float arrays)."""
    lib = _load()
    n = int(min(len(ref), len(deg)))
    r = np.ascontiguousarray(ref[:n], dtype=np.float32)
    d = np.ascontiguousarray(deg[:n], dtype=np.float32)
    return float(
        lib.pesq_mos(
            r.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            int(sample_rate),
        )
    )
