"""Native (C++) host-side runtime components, loaded via ctypes.

Currently: fast OpenFOAM ASCII tokenizers (``foam_parse.cpp``).  The library
is compiled on demand with the system ``g++`` and cached next to the source;
every consumer falls back to the pure-numpy implementation when native code
is unavailable, so the framework never hard-requires a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "foam_parse.cpp"
_LIB = _HERE / "libfoamparse.so"

_lib = None
_load_attempted = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def get_lib():
    """The loaded native library, building it on first use; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.foam_parse_doubles.restype = ctypes.c_int64
    lib.foam_parse_doubles.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ]
    lib.foam_parse_labels.restype = ctypes.c_int64
    lib.foam_parse_labels.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.foam_parse_faces.restype = ctypes.c_int64
    lib.foam_parse_faces.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def parse_doubles(text: str, max_out: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode()
    out = np.empty(max_out, dtype=np.float64)
    n = lib.foam_parse_doubles(
        raw, len(raw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_out,
    )
    return out[:n]


def parse_labels(text: str, max_out: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode()
    out = np.empty(max_out, dtype=np.int32)
    n = lib.foam_parse_labels(
        raw, len(raw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_out,
    )
    return out[:n]


def parse_faces(
    text: str, n_faces: int, max_points: int
) -> tuple[np.ndarray, np.ndarray] | None:
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode()
    offsets = np.zeros(n_faces + 1, dtype=np.int32)
    points = np.empty(max_points, dtype=np.int32)
    n = lib.foam_parse_faces(
        raw, len(raw), n_faces,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_points,
    )
    if n < 0:
        # points buffer overflow: caller retries with a bigger buffer
        return None
    if n < n_faces:
        return None
    return offsets, points[: offsets[n_faces]]
