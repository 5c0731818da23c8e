"""Modular arithmetic over <= 60-bit prime moduli, on 32-bit limb pairs.

Design (TPU-first, branch-free):

* ``add/sub``: 64-bit add + one conditional subtract (select, no branches).
* Multiplication by a *constant* ``c < q`` uses Shoup's trick: with
  ``c' = floor(c * 2^64 / q)`` precomputed on host,
  ``h = mulhi64(x, c'); r = x*c - h*q (mod 2^64)`` satisfies ``r < 2q`` for ANY
  64-bit ``x``; one conditional subtract finishes. This covers every NTT
  twiddle and every RNS table constant.
* A general variable*variable mulmod splits the 128-bit product ``H*2^64 + L``
  and reduces each half with a constant-multiplier reduction:
  ``H * (2^64 mod q)`` via Shoup, and ``L mod q`` via single-word Barrett with
  ``mu = floor(2^64 / q)``. This avoids a full 128-bit Barrett on 32-bit
  hardware.

Semantics are value-identical to the reference's 64-bit integer ops
(``ubintnat.h``: ModMulFast/ModMulFastConst/ModAddFast/...), but derived
independently; this module implements the op surface the reference's DPU
kernels mirror (``src/core/include/pim/common.h`` mod_kernel enum).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .limb import (
    U32,
    U64,
    add64,
    eq64,
    from_int,
    geq64,
    lt64,
    mul32x32,
    mul64_full,
    mul64_lo,
    mulhi64,
    select64,
    shr64,
    sub64,
)


class ModConsts(NamedTuple):
    """Device-resident per-modulus constants.

    Each field is a U64 whose arrays broadcast against residue data, e.g.
    shape [L, 1] for a chain of L tower moduli acting on [L, n] data.
    """

    q: U64          # the modulus
    mu: U64         # floor(2^64 / q) -- single-word Barrett constant
    r64: U64        # 2^64 mod q
    r64_precon: U64  # floor(r64 * 2^64 / q) -- Shoup precon for r64


def shoup_precon_int(c: int, q: int) -> int:
    """Host: Shoup precomputation floor(c * 2^64 / q), c < q."""
    assert 0 <= c < q
    return (c << 64) // q


def make_mod_consts(moduli: Sequence[int], trailing_dims: int = 1) -> ModConsts:
    """Host: build broadcastable ModConsts for a chain of moduli.

    trailing_dims singleton axes are appended so shape is [L] + [1]*trailing.
    """
    qs = [int(q) for q in moduli]
    for q in qs:
        assert 1 < q < (1 << 62), "modulus must fit with 2q < 2^63 headroom"
    shape = (len(qs),) + (1,) * trailing_dims

    def mk(vals):
        lo = np.asarray([v & 0xFFFFFFFF for v in vals], np.uint32).reshape(shape)
        hi = np.asarray([v >> 32 for v in vals], np.uint32).reshape(shape)
        return U64(lo, hi)  # host-resident constants; jit captures them

    mus = [(1 << 64) // q for q in qs]
    r64s = [(1 << 64) % q for q in qs]
    r64_pre = [shoup_precon_int(r, q) for r, q in zip(r64s, qs)]
    return ModConsts(mk(qs), mk(mus), mk(r64s), mk(r64_pre))


def make_scalar_mod_consts(q: int) -> ModConsts:
    return make_mod_consts([q], trailing_dims=0)._replace()  # shape [1]


# ---------------------------------------------------------------------------
# Core ops. All inputs reduced (< q) unless stated; all outputs reduced.
# ---------------------------------------------------------------------------


def add_mod(a: U64, b: U64, q: U64) -> U64:
    """(a + b) mod q for a, b < q < 2^63."""
    s = add64(a, b)
    return select64(geq64(s, q), sub64(s, q), s)


def sub_mod(a: U64, b: U64, q: U64) -> U64:
    """(a - b) mod q for a, b < q."""
    d = sub64(a, b)
    # underflow iff a < b; then add q back (wraparound makes d = a-b+2^64)
    return select64(geq64(a, b), d, add64(d, q))


def neg_mod(a: U64, q: U64) -> U64:
    """(-a) mod q for a < q."""
    r = sub64(q, a)
    zero = U64(jnp.zeros_like(a.lo), jnp.zeros_like(a.hi))
    is_zero = (a.lo == 0) & (a.hi == 0)
    return select64(is_zero, zero, r)


def cond_sub(r: U64, q: U64) -> U64:
    """r - q if r >= q else r (single correction step)."""
    return select64(geq64(r, q), sub64(r, q), r)


def barrett_word(x: U64, q: U64, mu: U64) -> U64:
    """x mod q for ANY 64-bit x, with mu = floor(2^64/q). Result < q."""
    h = mulhi64(x, mu)
    r = sub64(x, mul64_lo(h, q))
    return cond_sub(r, q)


def mul_mod_shoup(x: U64, c: U64, c_precon: U64, q: U64) -> U64:
    """(x * c) mod q for constant c < q with Shoup precon; any 64-bit x."""
    h = mulhi64(x, c_precon)
    r = sub64(mul64_lo(x, c), mul64_lo(h, q))
    return cond_sub(r, q)


def mul_mod_shoup_lazy(x: U64, c: U64, c_precon: U64, q: U64) -> U64:
    """Same but result in [0, 2q) -- callers fold the correction elsewhere."""
    h = mulhi64(x, c_precon)
    return sub64(mul64_lo(x, c), mul64_lo(h, q))


def mul_mod(x: U64, y: U64, m: ModConsts) -> U64:
    """General (x * y) mod q for x, y < 2^64. Result < q.

    128-bit product H*2^64 + L; H*(2^64 mod q) via Shoup, L via Barrett.
    """
    lo, hi = mul64_full(x, y)
    t1 = mul_mod_shoup(hi, m.r64, m.r64_precon, m.q)
    t2 = barrett_word(lo, m.q, m.mu)
    return add_mod(t1, t2, m.q)


def div_round_word(x: U64, q: U64, mu: U64):
    """Exact (quotient, remainder, rounded quotient) of 64-bit x by q.

    Barrett gives h in {floor(x/q)-1, floor(x/q)}; one correction makes it
    exact. Rounded = h + (2r >= q) with ties rounding up (matches the
    reference's DivideAndRound = floor(x/q + 1/2) convention).
    """
    h = mulhi64(x, mu)
    r = sub64(x, mul64_lo(h, q))
    fix = geq64(r, q)
    one = from_int(1, ())
    h = select64(fix, add64(h, one), h)
    r = select64(fix, sub64(r, q), r)
    twice = add64(r, r)  # r < q < 2^63, no overflow
    round_up = geq64(twice, q)
    h_round = select64(round_up, add64(h, one), h)
    return h, r, h_round


def mod_by_two(a: U64) -> U64:
    return U64(a.lo & U32(1), jnp.zeros_like(a.hi))


def switch_modulus(a: U64, m_old: ModConsts, m_new: ModConsts) -> U64:
    """Centered lift-and-reduce: interpret a in [-q/2, q/2), re-reduce mod q'.

    Mirrors the reference's NativeVector::SwitchModulus semantics
    (``math/hal/intnat/mubintvecnat.cpp``): values above q/2 represent
    negatives, so a' = (a + (q' - q mod q')) mod q'; otherwise a' = a mod q'.
    """
    half = shr64(m_old.q, 1)
    big = lt64(half, a)  # a > q/2
    q_mod_new = barrett_word(m_old.q, m_new.q, m_new.mu)
    diff = neg_mod(q_mod_new, m_new.q)  # (q' - q) mod q'
    # a < 2^62 and diff < q' < 2^62: the 64-bit add cannot overflow.
    shifted = barrett_word(add64(a, diff), m_new.q, m_new.mu)
    small = barrett_word(a, m_new.q, m_new.mu)
    return select64(big, shifted, small)


def mod_exp(a: U64, e: U64, m: ModConsts) -> U64:
    """a^e mod q via 64-step square-and-multiply (device-traceable)."""

    def body(i, carry):
        result, base = carry
        bit_word = jnp.where(i < 32, e.lo, e.hi)
        bit = (bit_word >> jnp.where(i < 32, i, i - 32)) & U32(1)
        mult = mul_mod(result, base, m)
        result = select64(bit.astype(bool), mult, result)
        base = mul_mod(base, base, m)
        return result, base

    one = from_int(1, jnp.shape(a.lo))
    result, _ = jax.lax.fori_loop(0, 64, body, (one, a))
    return result


# ---------------------------------------------------------------------------
# Single-limb u32 fast path for moduli q < 2^31 (2q fits a uint32 lane).
# The NTT engine dispatches here when every tower modulus is below 2^31 —
# one native 32-bit multiply replaces each pair of 16-bit half-product
# trees, cutting a Shoup modmul from ~28 to 6 hardware multiplies. Values
# are plain uint32 arrays (the `lo` plane of the corresponding U64s).
# ---------------------------------------------------------------------------


def shoup_precon32_int(c: int, q: int) -> int:
    """Host: floor(c * 2^32 / q) for c < q < 2^31 (fits uint32)."""
    assert 0 <= c < q < (1 << 31)
    return (c << 32) // q


def is_u32_moduli(moduli) -> bool:
    """True when every modulus fits the single-limb u32 fast path."""
    return all(int(q) < (1 << 31) for q in moduli)


class ModConsts32(NamedTuple):
    """Single-limb per-modulus constants for q < 2^31 (uint32 host arrays,
    broadcastable like ModConsts)."""

    q: np.ndarray        # the modulus
    mu: np.ndarray       # floor(2^32 / q) -- single-word Barrett constant
    r32: np.ndarray      # 2^32 mod q
    r32_pre: np.ndarray  # floor(r32 * 2^32 / q)


def make_mod_consts32(moduli: Sequence[int],
                      trailing_dims: int = 1) -> ModConsts32:
    qs = [int(q) for q in moduli]
    for q in qs:
        assert 1 < q < (1 << 31), "u32 consts need q < 2^31"
    shape = (len(qs),) + (1,) * trailing_dims

    def mk(vals):
        return np.asarray(vals, np.uint32).reshape(shape)

    mus = [(1 << 32) // q for q in qs]
    r32s = [(1 << 32) % q for q in qs]
    r32_pre = [shoup_precon32_int(r, q) for r, q in zip(r32s, qs)]
    return ModConsts32(mk(qs), mk(mus), mk(r32s), mk(r32_pre))


def add_mod32(a, b, q):
    """(a + b) mod q for a, b < q < 2^31 (sum fits u32)."""
    s = a + b
    return jnp.where(s >= q, s - q, s)


def sub_mod32(a, b, q):
    """(a - b) mod q for a, b < q (wraparound + correction)."""
    d = a - b
    return jnp.where(a >= b, d, d + q)


def mul_mod_shoup32(x, c, c_precon, q):
    """(x * c) mod q for constant c < q < 2^31 with 32-bit Shoup precon
    c_precon = floor(c*2^32/q), for ANY uint32 x (same proof as the 64-bit
    variant: h = floor(x*c'/2^32) >= x*c/q - x/2^32 - 1 > x*c/q - 2, so
    r = x*c - h*q lands in [0, 2q) and the wrapped u32 arithmetic is
    consistent since 2q < 2^32); one conditional subtract finishes. All
    multiplies are native u32."""
    h = mul32x32(x, c_precon).hi
    r = x * c - h * q
    return jnp.where(r >= q, r - q, r)


def neg_mod32(a, q):
    """(-a) mod q for a < q."""
    return jnp.where(a == 0, a, q - a)


def barrett_word32(x, q, mu):
    """x mod q for ANY uint32 x, with mu = floor(2^32/q), q < 2^31.
    h = mulhi32(x, mu) is floor(x/q) or floor(x/q)-1, so one conditional
    subtract of the sub-2q remainder finishes."""
    h = mul32x32(x, mu).hi
    r = x - h * q
    return jnp.where(r >= q, r - q, r)


def mul_mod32(x, y, m: ModConsts32):
    """General (x * y) mod q for x, y < 2^32, q < 2^31: split the 64-bit
    product H*2^32 + L; H*(2^32 mod q) via Shoup, L via Barrett."""
    p = mul32x32(x, y)
    t1 = mul_mod_shoup32(p.hi, m.r32, m.r32_pre, m.q)
    t2 = barrett_word32(p.lo, m.q, m.mu)
    return add_mod32(t1, t2, m.q)


def switch_modulus32(a, m_old: ModConsts32, m_new: ModConsts32):
    """Centered lift-and-reduce (see switch_modulus), all-u32 chains."""
    half = m_old.q >> 1
    big = a > half
    q_mod_new = barrett_word32(m_old.q, m_new.q, m_new.mu)
    diff = neg_mod32(q_mod_new, m_new.q)  # (q' - q) mod q'
    # a < 2^31 and diff < q' < 2^31: the u32 add cannot overflow.
    shifted = barrett_word32(a + diff, m_new.q, m_new.mu)
    small = barrett_word32(a, m_new.q, m_new.mu)
    return jnp.where(big, shifted, small)
