"""ctypes binding for the native C++ monotonic-align kernel.

Loads `native/libmonotonic_align.so` (OpenMP batch-parallel DP, see
`native/monotonic_align.cpp`), building it on first use if a toolchain is
available. This is the CPU-host fast path, mirroring the role of the
reference's Cython module; on-device code uses the Pallas/scan versions.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmonotonic_align.so"
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.maximum_path_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.maximum_path_batch.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def maximum_path_native(neg_cent: np.ndarray, t_ys, t_xs) -> np.ndarray:
    """neg_cent (B, T_y, T_x) float32 → one-hot path, via the C++ kernel."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native monotonic_align library unavailable "
                           f"(expected {_LIB_PATH}; run `make -C native`)")
    values = np.ascontiguousarray(neg_cent, dtype=np.float32).copy()
    paths = np.zeros_like(values)
    t_ys = np.ascontiguousarray(t_ys, dtype=np.int32)
    t_xs = np.ascontiguousarray(t_xs, dtype=np.int32)
    b, t_y, t_x = values.shape
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.maximum_path_batch(values.ctypes.data_as(fp), paths.ctypes.data_as(fp),
                           t_ys.ctypes.data_as(ip), t_xs.ctypes.data_as(ip),
                           b, t_y, t_x)
    return paths
