"""Euclidean distance transform via the native C++ kernel (native/edt.cc).

scipy-compatible: ``distance_transform_edt(input, sampling)`` returns, for
each voxel, the distance to the nearest **zero** voxel of ``input``.
Builds the shared library on first use (``make -C native``) and falls back
to scipy if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libedt.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.edt_3d.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_int,
        ]
        lib.edt_3d.restype = None
        _lib = lib
        return lib
    except OSError:
        _build_failed = True
        return None


def distance_transform_edt(
    input_array: np.ndarray,
    sampling: Optional[Sequence[float]] = None,
    n_threads: int = 4,
) -> np.ndarray:
    """Distance to the nearest zero voxel (scipy semantics)."""
    arr = np.ascontiguousarray(input_array)
    if arr.ndim != 3:
        from scipy.ndimage import distance_transform_edt as scipy_edt

        return scipy_edt(arr, sampling=sampling)

    lib = _load()
    if lib is None:
        from scipy.ndimage import distance_transform_edt as scipy_edt

        return scipy_edt(arr, sampling=sampling)

    if sampling is None:
        sampling = (1.0, 1.0, 1.0)
    elif np.isscalar(sampling):
        sampling = (float(sampling),) * 3

    # seeds (distance 0) are the ZERO voxels of input → mask = (input == 0)
    mask = np.ascontiguousarray((arr == 0).astype(np.uint8))
    out = np.empty(arr.shape, dtype=np.float64)
    lib.edt_3d(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        arr.shape[0],
        arr.shape[1],
        arr.shape[2],
        float(sampling[0]),
        float(sampling[1]),
        float(sampling[2]),
        int(n_threads),
    )
    return out
