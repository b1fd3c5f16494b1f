"""ctypes loader for the native filter kernels (bitset_kernels.c).

The shared object is built by `make native` (or on-demand here when a C
compiler is available); every caller falls back to the pure-numpy path
when loading fails, so the native layer is an accelerator, never a
dependency. Op codes mirror the C enum.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

OP_GT, OP_GE, OP_EQ, OP_LT, OP_LE, OP_RANGE = range(6)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bitset_kernels.c")
_SO = os.path.join(_HERE, "_bitset_kernels.so")

_lib = None


def _build() -> bool:
    cc = os.environ.get("CC", "cc")
    try:
        subprocess.run(
            [cc, "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=60,
        )
        return True
    except Exception:
        try:  # -march=native unsupported on some toolchains
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True,
                capture_output=True,
                timeout=60,
            )
            return True
        except Exception:
            return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if os.environ.get("COMET_NO_NATIVE"):
            return None
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.bsi_compare_pack.argtypes = [
        u64p, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_uint64, ctypes.c_uint64,
        u64p, ctypes.c_size_t, u64p,
    ]
    lib.bsi_compare_pack.restype = None
    lib.bitset_and_many.argtypes = [
        u64p, ctypes.c_size_t, ctypes.c_size_t, u64p,
    ]
    lib.bitset_and_many.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def bsi_compare_pack(
    vals: np.ndarray,      # [n] uint64 biased, n % 64 == 0, C-contiguous
    op: int,
    lo: int,
    hi: int,
    ebm_words: np.ndarray,  # [w] uint64
) -> np.ndarray | None:
    """Fused compare + pack + existence-AND; None when native is absent."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(len(vals) >> 6, dtype=np.uint64)
    lib.bsi_compare_pack(
        _ptr(vals), len(vals), int(op),
        ctypes.c_uint64(lo & ((1 << 64) - 1)).value,
        ctypes.c_uint64(hi & ((1 << 64) - 1)).value,
        _ptr(ebm_words), len(ebm_words), _ptr(out),
    )
    return out


def bitset_and_many(rows: np.ndarray) -> np.ndarray | None:
    """AND-reduce [r, words] uint64 rows; None when native is absent."""
    lib = _load()
    if lib is None or rows.size == 0:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.uint64)
    out = np.empty(rows.shape[1], dtype=np.uint64)
    lib.bitset_and_many(_ptr(rows), rows.shape[0], rows.shape[1], _ptr(out))
    return out
