"""ctypes loader for the C++ field-arithmetic oracle (oracle/fieldcheck.cpp).

Builds the shared library on first use (g++ -O2, cached next to the source).
See SURVEY.md §7 "oracle/": an implementation independent from both the
Python-int host field and the JAX limb kernels, used to cross-check them.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fieldcheck.cpp")
_LIB = os.path.join(_DIR, "libfieldcheck.so")

MAX_LIMBS = 12  # 768 bits


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
        check=True,
        capture_output=True,
    )


_lib = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        _lib = ctypes.CDLL(_LIB)
        for name in ("oracle_mont_mul_batch", "oracle_mod_mul_batch"):
            fn = getattr(_lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
            ]
        fn = _lib.oracle_mod_pow_batch
        fn.restype = ctypes.c_int
        fn.argtypes = _lib.oracle_mod_mul_batch.argtypes
    return _lib


def _n_limbs(modulus: int) -> int:
    n = (modulus.bit_length() + 63) // 64
    assert n <= MAX_LIMBS, "modulus too large for the oracle"
    return n


def _pack(vals: list[int], n: int):
    arr = (ctypes.c_uint64 * (n * len(vals)))()
    for k, v in enumerate(vals):
        for i in range(n):
            arr[k * n + i] = (v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF
    return arr


def _unpack(arr, n: int, count: int) -> list[int]:
    out = []
    for k in range(count):
        v = 0
        for i in range(n):
            v |= int(arr[k * n + i]) << (64 * i)
        out.append(v)
    return out


def _run(fn_name: str, modulus: int, a: list[int], b: list[int]) -> list[int]:
    n = _n_limbs(modulus)
    count = len(a)
    assert len(b) == count
    mod_arr = _pack([modulus], n)
    a_arr, b_arr = _pack(a, n), _pack(b, n)
    out_arr = (ctypes.c_uint64 * (n * count))()
    rc = getattr(lib(), fn_name)(mod_arr, n, a_arr, b_arr, out_arr, count)
    assert rc == 0, f"{fn_name} failed"
    return _unpack(out_arr, n, count)


def mod_mul(modulus: int, a: list[int], b: list[int]) -> list[int]:
    """Elementwise a*b mod modulus via the C++ oracle."""
    return _run("oracle_mod_mul_batch", modulus, a, b)


def mod_pow(modulus: int, base: list[int], exp: list[int]) -> list[int]:
    """Elementwise base^exp mod modulus via the C++ oracle."""
    return _run("oracle_mod_pow_batch", modulus, base, exp)
