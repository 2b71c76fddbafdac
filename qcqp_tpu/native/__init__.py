"""ctypes bindings for the native canonicalization/IO library.

The reference's canonicalization rides on the CVXcanon C++ extension
(reference: setup.py:13); qcqp_tpu's native layer serves the same role for
the hot per-atom coefficient emission, plus a threaded binary problem-bank
loader for scenario-parallel serving.  Pure-numpy fallbacks keep everything
working when the shared library hasn't been built (`make -C qcqp_tpu/native`
or `qcqp_tpu.native.build()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libqcqpnative.so")
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> bool:
    """Compile the shared library with g++ (idempotent)."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    src = os.path.join(_DIR, "canon.cc")
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
           "-o", _LIB_PATH, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if os.environ.get("QCQP_TPU_NATIVE", "1") == "0" or not build():
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    i8p = ctypes.POINTER(ctypes.c_int8)
    i64 = ctypes.c_int64
    lib.qn_square_accumulate.argtypes = [dp, dp, i64, i64, ctypes.c_double,
                                         dp, dp, dp]
    lib.qn_mul_accumulate.argtypes = [dp, dp, dp, dp, i64, i64,
                                      ctypes.c_double, dp, dp, dp]
    lib.qn_bank_write.restype = i64
    lib.qn_bank_write.argtypes = [ctypes.c_char_p, i64, i64, i64, dp, dp, dp,
                                  i8p]
    lib.qn_bank_info.restype = i64
    lib.qn_bank_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(i64),
                                 ctypes.POINTER(i64), ctypes.POINTER(i64)]
    lib.qn_bank_load.restype = i64
    lib.qn_bank_load.argtypes = [ctypes.c_char_p, i64, i64, dp, dp, dp, i8p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _i8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))


# ---------------------------------------------------------------------------
# Canonicalization kernels (with numpy fallback)
# ---------------------------------------------------------------------------

def square_accumulate(C: np.ndarray, d: np.ndarray, w: float,
                      P: np.ndarray, q: np.ndarray, r: np.ndarray) -> None:
    """P[j] += w c_j c_j^T; q[j] += 2 w d_j c_j; r[j] += w d_j^2 (in place)."""
    lib = _load()
    s, n = C.shape
    if lib is not None and s * n * n >= 1 << 16:
        C = np.ascontiguousarray(C, np.float64)
        d = np.ascontiguousarray(d, np.float64)
        lib.qn_square_accumulate(_dp(C), _dp(d), s, n, float(w),
                                 _dp(P), _dp(q), _dp(r))
        return
    P += w * (C[:, :, None] * C[:, None, :])
    q += 2.0 * w * d[:, None] * C
    r += w * d * d


def mul_accumulate(Ca, da, Cb, db, w, P, q, r) -> None:
    lib = _load()
    s, n = Ca.shape
    if lib is not None and s * n * n >= 1 << 16:
        Ca = np.ascontiguousarray(Ca, np.float64)
        Cb = np.ascontiguousarray(Cb, np.float64)
        da = np.ascontiguousarray(da, np.float64)
        db = np.ascontiguousarray(db, np.float64)
        lib.qn_mul_accumulate(_dp(Ca), _dp(da), _dp(Cb), _dp(db), s, n,
                              float(w), _dp(P), _dp(q), _dp(r))
        return
    P += 0.5 * w * (Ca[:, :, None] * Cb[:, None, :]
                    + Cb[:, :, None] * Ca[:, None, :])
    q += w * (da[:, None] * Cb + db[:, None] * Ca)
    r += w * da * db


# ---------------------------------------------------------------------------
# Problem-bank IO (with numpy .npz fallback)
# ---------------------------------------------------------------------------

def bank_write(path: str, P: np.ndarray, q: np.ndarray, r: np.ndarray,
               is_eq: np.ndarray) -> None:
    """Write a batch of instances: P (count, m+1, n, n), q, r, is_eq."""
    count, k, n, _ = P.shape
    m = k - 1
    lib = _load()
    if lib is None:
        np.savez(path, P=P, q=q, r=r, is_eq=is_eq)
        return
    P = np.ascontiguousarray(P, np.float64)
    q = np.ascontiguousarray(q, np.float64)
    r = np.ascontiguousarray(r, np.float64)
    eq = np.ascontiguousarray(is_eq.astype(np.int8))
    rc = lib.qn_bank_write(path.encode(), count, n, m, _dp(P), _dp(q), _dp(r),
                           _i8p(eq))
    if rc != 0:
        raise IOError(f"qn_bank_write failed: {rc}")


def bank_info(path: str) -> Tuple[int, int, int]:
    lib = _load()
    if lib is None:
        with np.load(path if path.endswith(".npz") else path + ".npz") as z:
            c, k, n, _ = z["P"].shape
            return c, n, k - 1
    c = ctypes.c_int64(); n = ctypes.c_int64(); m = ctypes.c_int64()
    rc = lib.qn_bank_info(path.encode(), ctypes.byref(c), ctypes.byref(n),
                          ctypes.byref(m))
    if rc != 0:
        raise IOError(f"qn_bank_info failed: {rc}")
    return c.value, n.value, m.value


def bank_load(path: str, start: int, batch: int):
    """Load instances [start, start+batch) as stacked arrays (threaded)."""
    lib = _load()
    if lib is None:
        with np.load(path if path.endswith(".npz") else path + ".npz") as z:
            sl = slice(start, start + batch)
            return (z["P"][sl], z["q"][sl], z["r"][sl],
                    z["is_eq"][sl].astype(bool))
    count, n, m = bank_info(path)
    k = m + 1
    P = np.empty((batch, k, n, n), np.float64)
    q = np.empty((batch, k, n), np.float64)
    r = np.empty((batch, k), np.float64)
    eq = np.empty((batch, m), np.int8)
    rc = lib.qn_bank_load(path.encode(), start, batch, _dp(P), _dp(q), _dp(r),
                          _i8p(eq))
    if rc != 0:
        raise IOError(f"qn_bank_load failed: {rc}")
    return P, q, r, eq.astype(bool)
