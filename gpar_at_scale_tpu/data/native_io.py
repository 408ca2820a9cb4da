"""ctypes bridge to the native (C++) data-ingest runtime.

Loads ``native/libgpar_io.so`` (built on demand with ``make -C native``) and
exposes the multi-threaded CSV parser as numpy arrays.  Falls back to a pure-
Python reader when the toolchain is unavailable so the framework never hard-
depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libgpar_io.so"))

_lib = None
_build_attempted = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.csv_open.restype = ctypes.c_void_p
    lib.csv_open.argtypes = [ctypes.c_char_p]
    lib.csv_rows.restype = ctypes.c_long
    lib.csv_rows.argtypes = [ctypes.c_void_p]
    lib.csv_cols.restype = ctypes.c_long
    lib.csv_cols.argtypes = [ctypes.c_void_p]
    lib.csv_colname.restype = ctypes.c_char_p
    lib.csv_colname.argtypes = [ctypes.c_void_p, ctypes.c_long]
    lib.csv_data.restype = ctypes.POINTER(ctypes.c_double)
    lib.csv_data.argtypes = [ctypes.c_void_p]
    lib.csv_close.argtypes = [ctypes.c_void_p]
    lib.csv_last_error.restype = ctypes.c_char_p
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def read_csv(path: str) -> Tuple[np.ndarray, List[str]]:
    """Parse a numeric CSV with a header row -> (data (R, C) float64, names).

    Uses the multi-threaded native parser when available; numpy fallback
    otherwise.  Non-numeric cells become NaN in both paths.
    """
    lib = _load_lib()
    if lib is None:
        return _read_csv_python(path)
    h = lib.csv_open(path.encode())
    if not h:
        raise IOError(f"csv_open failed: {lib.csv_last_error().decode()}")
    try:
        rows = lib.csv_rows(h)
        cols = lib.csv_cols(h)
        names = [lib.csv_colname(h, j).decode() for j in range(cols)]
        ptr = lib.csv_data(h)
        # Copy out of the native buffer before closing the handle.
        data = np.ctypeslib.as_array(ptr, shape=(rows, cols)).copy()
        return data, names
    finally:
        lib.csv_close(h)


def _read_csv_python(path: str) -> Tuple[np.ndarray, List[str]]:
    import csv

    with open(path, newline="") as f:
        reader = csv.reader(f)
        names = [h.strip().strip('"') for h in next(reader)]
        rows = []
        for row in reader:
            if not row:
                continue
            vals = []
            for cell in row[: len(names)]:
                try:
                    vals.append(float(cell))
                except ValueError:
                    vals.append(float("nan"))
            vals.extend([float("nan")] * (len(names) - len(vals)))
            rows.append(vals)
    return np.asarray(rows, dtype=np.float64), names
