"""ctypes bindings for the native exact-arithmetic oracle (oracle.cpp).

Lazily compiles liboracle.so with g++ on first use (cached next to the
source). Degrades gracefully: `available()` returns False when no compiler
is present, and callers fall back to the pure-Python big-int oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "oracle.cpp")
_LIB = os.path.join(_DIR, "liboracle.so")


@lru_cache(maxsize=1)
def _load():
    if not os.path.exists(_LIB) or \
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", _LIB, _SRC],
            check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.oracle_mod_add_vec.argtypes = [u64p, u64p, u64p, ctypes.c_uint64,
                                       ctypes.c_size_t]
    lib.oracle_mod_sub_vec.argtypes = lib.oracle_mod_add_vec.argtypes
    lib.oracle_mod_mul_vec.argtypes = lib.oracle_mod_add_vec.argtypes
    lib.oracle_mod_exp_vec.argtypes = lib.oracle_mod_add_vec.argtypes
    lib.oracle_ntt_plan_new.restype = ctypes.c_void_p
    lib.oracle_ntt_plan_new.argtypes = [ctypes.c_size_t, ctypes.c_uint64,
                                        ctypes.c_uint64]
    lib.oracle_ntt_plan_free.argtypes = [ctypes.c_void_p]
    lib.oracle_ntt_forward.argtypes = [ctypes.c_void_p, u64p]
    lib.oracle_ntt_inverse.argtypes = [ctypes.c_void_p, u64p]
    lib.oracle_approx_switch.argtypes = [u64p, u64p, ctypes.c_size_t, u64p,
                                         ctypes.c_size_t, ctypes.c_size_t,
                                         u64p]
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _binary(fname, a, b, q):
    lib = _load()
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    out = np.empty_like(a)
    getattr(lib, fname)(_p(a), _p(b), _p(out), q, a.size)
    return out


def mod_add(a, b, q):
    return _binary("oracle_mod_add_vec", a, b, q)


def mod_sub(a, b, q):
    return _binary("oracle_mod_sub_vec", a, b, q)


def mod_mul(a, b, q):
    return _binary("oracle_mod_mul_vec", a, b, q)


def mod_exp(a, e, q):
    return _binary("oracle_mod_exp_vec", a, e, q)


class NttOracle:
    """Native negacyclic NTT plan for one modulus."""

    def __init__(self, n: int, q: int, psi: int):
        self._lib = _load()
        self._plan = self._lib.oracle_ntt_plan_new(n, q, psi)
        self.n, self.q = n, q

    def __del__(self):
        if getattr(self, "_plan", None):
            self._lib.oracle_ntt_plan_free(self._plan)

    def forward(self, a) -> np.ndarray:
        buf = np.ascontiguousarray(a, dtype=np.uint64).copy()
        self._lib.oracle_ntt_forward(self._plan, _p(buf))
        return buf

    def inverse(self, a) -> np.ndarray:
        buf = np.ascontiguousarray(a, dtype=np.uint64).copy()
        self._lib.oracle_ntt_inverse(self._plan, _p(buf))
        return buf


def approx_switch(x, from_moduli, to_moduli) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.uint64)
    L, n = x.shape
    fq = np.ascontiguousarray(from_moduli, dtype=np.uint64)
    tq = np.ascontiguousarray(to_moduli, dtype=np.uint64)
    out = np.empty((len(to_moduli), n), dtype=np.uint64)
    lib.oracle_approx_switch(_p(x), _p(fq), L, _p(tq), len(tq), n, _p(out))
    return out
