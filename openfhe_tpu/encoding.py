"""Plaintext encodings.

* CKKS packed encoding: complex canonical embedding via the special 2n-th
  root FFT (reference: ``CKKSPackedEncoding`` + ``DiscreteFourierTransform::
  FFTSpecial``, ``pke/lib/encoding/ckkspackedencoding.cpp:126,426``),
  realized here with numpy FFTs on the host. Slot j holds the value of the
  plaintext polynomial at zeta^(5^j), zeta = exp(i*pi/n).

* Packed (BGV/BFV) integer encoding: CRT packing of Z_t slots via a
  negacyclic NTT mod t (reference: ``PackedEncoding``), reusing the same
  exact NTT machinery as the ciphertext ring.

Encoding/decoding are host-side (they sit at the user API boundary, not in
the homomorphic hot path).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence

import numpy as np

from .utils import nbtheory


@lru_cache(maxsize=None)
def _ckks_slot_exponents(n: int) -> np.ndarray:
    """Exponents e_j = 5^j mod 2n for j < n/2 (the CKKS slot order)."""
    exps = np.zeros(n // 2, dtype=np.int64)
    e = 1
    for j in range(n // 2):
        exps[j] = e
        e = e * 5 % (2 * n)
    return exps


def ckks_embed(coeffs: np.ndarray, n: int) -> np.ndarray:
    """Evaluate real-coefficient poly at zeta^(5^j): n coeffs -> n/2 slots."""
    c = np.zeros(2 * n, dtype=np.complex128)
    c[: len(coeffs)] = coeffs
    # ifft uses exp(+2*pi*i*k*e/(2n)); scale back by 2n
    evals = np.fft.ifft(c) * (2 * n)
    return evals[_ckks_slot_exponents(n)]


def ckks_embed_inv(slots: np.ndarray, n: int) -> np.ndarray:
    """Inverse canonical embedding: n/2 slots -> n real coefficients."""
    exps = _ckks_slot_exponents(n)
    V = np.zeros(2 * n, dtype=np.complex128)
    V[exps] = slots
    V[(2 * n - exps) % (2 * n)] = np.conj(slots)
    c = np.fft.fft(V)[:n].real / n
    return c


def ckks_encode(values: Sequence[complex], n: int, scale: float) -> np.ndarray:
    """Complex slot values -> integer coefficient vector (int, rounded)."""
    slots = np.zeros(n // 2, dtype=np.complex128)
    vals = np.asarray(values, dtype=np.complex128)
    assert len(vals) <= n // 2, "too many slots"
    slots[: len(vals)] = vals
    coeffs = ckks_embed_inv(slots, n) * scale
    # exact rounding to Python ints (can exceed float64 int range at high
    # scale x depth; rint keeps us within 2^53 for standard params)
    return np.asarray([int(v) for v in np.rint(coeffs)], dtype=object)


def ckks_decode(coeffs: Sequence[int], n: int, scale: float,
                num_slots: int | None = None) -> np.ndarray:
    """Centered integer coefficients -> complex slot values (scaled down)."""
    cs = np.asarray([float(c) for c in coeffs])
    slots = ckks_embed(cs, n) / scale
    if num_slots is not None:
        slots = slots[:num_slots]
    return slots


# ---------------------------------------------------------------------------
# BGV/BFV packed encoding (slots via NTT mod t)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _packed_tables(n: int, t: int):
    """Negacyclic NTT tables mod t on the host (exact ints)."""
    assert (t - 1) % (2 * n) == 0, f"t={t} must be 1 mod 2n for packing"
    psi = nbtheory.root_of_unity(2 * n, t)
    psi_inv = pow(psi, -1, t)
    n_inv = pow(n, -1, t)
    return psi, psi_inv, n_inv


def _host_ntt(vals: List[int], t: int, psi: int, n: int) -> List[int]:
    """O(n log n) host negacyclic NTT mod t (natural -> bitrev), exact."""
    from .ops.ntt import bit_reverse_perm

    a = list(vals)
    m = 1
    # powers of psi in bit-reversed table order
    rev = bit_reverse_perm(n)
    pw = [1] * n
    for j in range(1, n):
        pw[j] = pw[j - 1] * psi % t
    psi_br = [pw[rev[j]] for j in range(n)]
    while m < n:
        step = n // (2 * m)
        for i in range(m):
            w = psi_br[m + i]
            base = 2 * i * step
            for j in range(base, base + step):
                u = a[j]
                v = a[j + step] * w % t
                a[j] = (u + v) % t
                a[j + step] = (u - v) % t
        m *= 2
    return a


def _host_intt(vals: List[int], t: int, psi_inv: int, n_inv: int,
               n: int) -> List[int]:
    from .ops.ntt import bit_reverse_perm

    a = list(vals)
    rev = bit_reverse_perm(n)
    pw = [1] * n
    for j in range(1, n):
        pw[j] = pw[j - 1] * psi_inv % t
    psi_inv_br = [pw[rev[j]] for j in range(n)]
    t_step = 1
    m = n
    while m > 1:
        h = m // 2
        for i in range(h):
            w = psi_inv_br[h + i]
            base = 2 * i * t_step
            for j in range(base, base + t_step):
                u = a[j]
                v = a[j + t_step]
                a[j] = (u + v) % t
                a[j + t_step] = (u - v) * w % t
        t_step *= 2
        m = h
    return [v * n_inv % t for v in a]


@lru_cache(maxsize=None)
def packed_slot_perm(n: int) -> "np.ndarray":
    """User-slot -> NTT-slot index map for the packed encoding.

    User slots are laid out as two rows of n/2 (the reference
    PackedEncoding's 2 x n/2 structure, packedencoding.cpp): row 0 slot i
    holds the evaluation at psi^(5^i mod 2n), row 1 slot i at
    psi^(-5^i mod 2n).  In this order the automorphism sigma_{5^r} is a
    simultaneous cyclic left-rotation of both rows (EvalAtIndex), and
    sigma_{2n-1} swaps the rows — matching the reference's rotation
    semantics without its index-translation tables.
    """
    from .ops.ntt import bit_reverse_perm

    rev = bit_reverse_perm(n)
    exp_to_slot = np.zeros(2 * n, dtype=np.int64)
    for j in range(n):
        exp_to_slot[2 * int(rev[j]) + 1] = j
    perm = np.zeros(n, dtype=np.int64)
    g = 1
    for i in range(n // 2):
        perm[i] = exp_to_slot[g]
        perm[i + n // 2] = exp_to_slot[2 * n - g]
        g = g * 5 % (2 * n)
    return perm


def packed_encode(values: Sequence[int], n: int, t: int) -> List[int]:
    """Z_t slot values -> plaintext polynomial coefficients mod t.

    User slots follow the 5-orbit row order of packed_slot_perm so that
    ciphertext-side rotations act as row rotations (reference:
    PackedEncoding CRT packing).
    """
    psi, psi_inv, n_inv = _packed_tables(n, t)
    perm = packed_slot_perm(n)
    vals = [int(v) % t for v in values] + [0] * (n - len(values))
    slots = [0] * n
    for j, v in enumerate(vals):
        slots[perm[j]] = v
    return _host_intt(slots, t, psi_inv, n_inv, n)


def packed_decode(coeffs: Sequence[int], n: int, t: int) -> List[int]:
    psi, psi_inv, n_inv = _packed_tables(n, t)
    ntt_slots = _host_ntt([int(c) % t for c in coeffs], t, psi, n)
    perm = packed_slot_perm(n)
    return [ntt_slots[perm[j]] for j in range(n)]


# ---------------------------------------------------------------------------
# Coefficient-packed and string encodings
# ---------------------------------------------------------------------------


def coef_encode(values: Sequence[int], n: int, t: int) -> List[int]:
    """Integers directly as polynomial coefficients mod t (reference:
    ``CoefPackedEncoding``, pke/lib/encoding/coefpackedencoding.cpp).
    Signed inputs are lifted to [0, t); decode re-centers."""
    if len(values) > n:
        raise ValueError(f"{len(values)} values exceed ring dimension {n}")
    return [int(v) % t for v in values] + [0] * (n - len(values))


def coef_decode(coeffs: Sequence[int], n: int, t: int,
                length: int | None = None) -> List[int]:
    """Inverse of coef_encode with centered lift to (-t/2, t/2]."""
    out = [int(c) % t for c in coeffs[: (n if length is None else length)]]
    return [v - t if v > t // 2 else v for v in out]


def string_encode(text: str, n: int, t: int = 256) -> List[int]:
    """UTF-8 bytes as coefficients (reference: ``StringEncoding``,
    pke/lib/encoding/stringencoding.cpp; fixed t=256 alphabet)."""
    data = text.encode("utf-8")
    if len(data) > n:
        raise ValueError(f"string of {len(data)} bytes exceeds ring dim {n}")
    return [int(b) % t for b in data] + [0] * (n - len(data))


def string_decode(coeffs: Sequence[int], t: int = 256) -> str:
    raw = bytes(int(c) % t for c in coeffs)
    return raw.rstrip(b"\x00").decode("utf-8", errors="replace")
