"""64-bit unsigned integer arithmetic emulated with 32-bit limbs.

TPUs have no 64-bit integer multiply; the VPU operates on 32-bit lanes. All
residue arithmetic in this framework therefore represents a 64-bit value as a
pair of uint32 arrays ``(lo, hi)``. Every function here is pure jax.numpy and
works identically inside Pallas kernels, under vmap/jit, and on CPU.

The 32x32->64 multiply is built from 16-bit half-products, each of which is
exact in a uint32 lane ((2^16-1)^2 < 2^32).

Semantics mirror the reference's native 64-bit integer layer
(``src/core/include/math/hal/intnat/ubintnat.h``) but the implementation is an
original TPU-first design: branch-free, lane-parallel, no carries via flags --
carry bits are recovered by unsigned wraparound comparisons.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_MASK16 = 0xFFFF
U32 = jnp.uint32


class U64(NamedTuple):
    """A 64-bit unsigned value as two uint32 arrays (limb-planar layout)."""

    lo: jnp.ndarray
    hi: jnp.ndarray

    @property
    def shape(self):
        return jnp.shape(self.lo)


def u64(lo, hi) -> U64:
    return U64(jnp.asarray(lo, U32), jnp.asarray(hi, U32))


def from_int(value: int, shape=(), dtype=np.uint32) -> U64:
    """Host helper: broadcast a Python int (< 2^64) to a U64 of given shape.

    Returns numpy-backed arrays: constants stay on the host until captured
    by jit (avoids device round trips during lowering).
    """
    value = int(value)
    assert 0 <= value < (1 << 64)
    lo = np.full(shape, value & 0xFFFFFFFF, dtype=dtype)
    hi = np.full(shape, value >> 32, dtype=dtype)
    return U64(lo, hi)


def from_int_array(values, dtype=np.uint32) -> U64:
    """Host helper: nested list / object array of Python ints -> U64 (exact).

    Goes through dtype=object to avoid numpy silently converting large ints
    to float64.
    """
    if isinstance(values, np.ndarray) and values.dtype in (np.int64,
                                                           np.uint64):
        # fast vectorized path for numeric arrays (values < 2^64)
        arr = values.astype(np.uint64)
        return U64((arr & np.uint64(0xFFFFFFFF)).astype(dtype),
                   (arr >> np.uint64(32)).astype(dtype))
    obj = np.asarray(values, dtype=object)
    flat = [int(v) for v in obj.ravel()]
    lo = np.asarray([v & 0xFFFFFFFF for v in flat], dtype).reshape(obj.shape)
    hi = np.asarray([(v >> 32) & 0xFFFFFFFF for v in flat], dtype).reshape(obj.shape)
    return U64(lo, hi)


def to_int_array(x: U64) -> np.ndarray:
    """Host helper: U64 -> numpy object array of Python ints (exact)."""
    lo = np.asarray(x.lo, dtype=np.uint32).astype(np.uint64)
    hi = np.asarray(x.hi, dtype=np.uint32).astype(np.uint64)
    merged = (hi << np.uint64(32)) | lo
    # object array of exact Python ints (values < 2^64 so uint64 is exact)
    return np.frompyfunc(int, 1, 1)(merged)


def zeros(shape) -> U64:
    z = jnp.zeros(shape, U32)
    return U64(z, z)


def full_like(x: U64, value: int) -> U64:
    return U64(
        jnp.full_like(x.lo, value & 0xFFFFFFFF),
        jnp.full_like(x.hi, value >> 32),
    )


# ---------------------------------------------------------------------------
# Addition / subtraction with carry recovery via wraparound compare
# ---------------------------------------------------------------------------


def add64(a: U64, b: U64) -> U64:
    """(a + b) mod 2^64."""
    lo = a.lo + b.lo
    carry = (lo < b.lo).astype(U32)
    hi = a.hi + b.hi + carry
    return U64(lo, hi)


def add64_carry(a: U64, b: U64):
    """(a + b) mod 2^64 plus the outgoing carry bit (uint32, 0 or 1)."""
    lo = a.lo + b.lo
    c0 = (lo < b.lo).astype(U32)
    hi_partial = a.hi + b.hi
    c1 = (hi_partial < b.hi).astype(U32)
    hi = hi_partial + c0
    c2 = (hi < c0).astype(U32)
    return U64(lo, hi), c1 + c2


def sub64(a: U64, b: U64) -> U64:
    """(a - b) mod 2^64."""
    lo = a.lo - b.lo
    borrow = (a.lo < b.lo).astype(U32)
    hi = a.hi - b.hi - borrow
    return U64(lo, hi)


def geq64(a: U64, b: U64) -> jnp.ndarray:
    """a >= b, elementwise bool."""
    return (a.hi > b.hi) | ((a.hi == b.hi) & (a.lo >= b.lo))


def lt64(a: U64, b: U64) -> jnp.ndarray:
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo < b.lo))


def eq64(a: U64, b: U64) -> jnp.ndarray:
    return (a.lo == b.lo) & (a.hi == b.hi)


def select64(pred, a: U64, b: U64) -> U64:
    """where(pred, a, b) elementwise."""
    return U64(jnp.where(pred, a.lo, b.lo), jnp.where(pred, a.hi, b.hi))


# ---------------------------------------------------------------------------
# Multiplication
# ---------------------------------------------------------------------------


def mul32x32(a, b) -> U64:
    """Exact 32x32 -> 64 product of uint32 arrays via 16-bit half-products."""
    a = jnp.asarray(a, U32)
    b = jnp.asarray(b, U32)
    a_lo = a & _MASK16
    a_hi = a >> 16
    b_lo = b & _MASK16
    b_hi = b >> 16
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    # mid column: ll>>16 + lh&0xFFFF + hl&0xFFFF  <= 3*(2^16-1), exact in u32
    mid = (ll >> 16) + (lh & _MASK16) + (hl & _MASK16)
    lo = (ll & _MASK16) | (mid << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return U64(lo, hi)


def mulhi32(a, b) -> jnp.ndarray:
    return mul32x32(a, b).hi


def mul64_lo(a: U64, b: U64) -> U64:
    """(a * b) mod 2^64."""
    p0 = mul32x32(a.lo, b.lo)
    cross = a.lo * b.hi + a.hi * b.lo  # wraps; only low 32 bits needed
    return U64(p0.lo, p0.hi + cross)


def mul64_full(a: U64, b: U64):
    """Full 64x64 -> 128 product as (lo: U64, hi: U64)."""
    p0 = mul32x32(a.lo, b.lo)  # weight 2^0
    p1 = mul32x32(a.lo, b.hi)  # weight 2^32
    p2 = mul32x32(a.hi, b.lo)  # weight 2^32
    p3 = mul32x32(a.hi, b.hi)  # weight 2^64
    # column at 2^32: p0.hi + p1.lo + p2.lo
    s1 = p0.hi + p1.lo
    c1 = (s1 < p1.lo).astype(U32)
    s2 = s1 + p2.lo
    c2 = (s2 < p2.lo).astype(U32)
    # column at 2^64: p1.hi + p2.hi + p3.lo + carries
    t1 = p1.hi + p2.hi
    d1 = (t1 < p2.hi).astype(U32)
    t2 = t1 + p3.lo
    d2 = (t2 < p3.lo).astype(U32)
    t3 = t2 + (c1 + c2)
    d3 = (t3 < t2).astype(U32)
    # column at 2^96
    top = p3.hi + d1 + d2 + d3
    return U64(p0.lo, s2), U64(t3, top)


def mulhi64(a: U64, b: U64) -> U64:
    """High 64 bits of the 128-bit product."""
    return mul64_full(a, b)[1]


# ---------------------------------------------------------------------------
# Shifts (static shift amounts only; enough for fixed-radix code)
# ---------------------------------------------------------------------------


def shr64(a: U64, k: int) -> U64:
    assert 0 <= k < 64
    if k == 0:
        return a
    if k < 32:
        lo = (a.lo >> k) | (a.hi << (32 - k))
        hi = a.hi >> k
        return U64(lo, hi)
    return U64(a.hi >> (k - 32), jnp.zeros_like(a.hi))


def shl64(a: U64, k: int) -> U64:
    assert 0 <= k < 64
    if k == 0:
        return a
    if k < 32:
        hi = (a.hi << k) | (a.lo >> (32 - k))
        lo = a.lo << k
        return U64(lo, hi)
    return U64(jnp.zeros_like(a.lo), a.lo << (k - 32))


# ---------------------------------------------------------------------------
# Packing helpers: stacked uint32 [2, ...] <-> U64
# ---------------------------------------------------------------------------


def pack(x: U64) -> jnp.ndarray:
    """U64 -> stacked uint32 array with leading limb axis [2, ...] (0=lo)."""
    return jnp.stack([x.lo, x.hi], axis=0)


def unpack(arr) -> U64:
    return U64(arr[0], arr[1])
