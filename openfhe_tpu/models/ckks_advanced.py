"""Advanced CKKS evaluation: automatic scale/level management, many-operand
trees, weighted sums, and Chebyshev series evaluation.

Role of the reference's AdvancedSHE capability + the FLEXIBLEAUTO scaling
technique (``pke/lib/schemebase/base-advancedshe.cpp``; scaling-factor
chains in ``ckksrns-cryptoparameters``): each depth k has a canonical
scaling factor s_k with s_0 = 2^p and s_{k+1} = s_k^2 / q_{T_k - 1}, and
every op returns ciphertexts at the canonical scale of their depth, so
arbitrary expression DAGs compose without manual rescale bookkeeping.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import numpy as np

from .. import keyswitch
from . import ckks
from .ckks import Ciphertext, CKKSContext


def depth_of(ctx: CKKSContext, ct: Ciphertext) -> int:
    return len(ctx.q_moduli) - ct.towers


@lru_cache(maxsize=None)
def scale_at(ctx: CKKSContext, k: int) -> float:
    """Canonical scaling factor at depth k (FLEXIBLEAUTO chain)."""
    if k == 0:
        return ctx.scale
    prev = scale_at(ctx, k - 1)
    towers_prev = len(ctx.q_moduli) - (k - 1)
    return prev * prev / ctx.q_moduli[towers_prev - 1]


def mult_const(ctx: CKKSContext, ct: Ciphertext, c: complex,
               enc_scale: float) -> Ciphertext:
    """Multiply by scalar c encoded at enc_scale (no rescale)."""
    pt = ckks.encode(ctx, np.full(ctx.params.num_slots, c),
                     towers=ct.towers, scale=enc_scale)
    from .. import dcrt
    return Ciphertext(tuple(dcrt.mul(p, pt) for p in ct.polys),
                      ct.scale * enc_scale)


def adjust_depth(ctx: CKKSContext, ct: Ciphertext, k_target: int
                 ) -> Ciphertext:
    """Bring ct to depth k_target at the canonical scale s_{k_target}
    (multiply by 1 at a compensating scale + rescale, per step)."""
    k = depth_of(ctx, ct)
    assert k_target >= k
    while k < k_target:
        T = ct.towers
        tau = scale_at(ctx, k + 1) * ctx.q_moduli[T - 1] / ct.scale
        ct = ckks.rescale(mult_const(ctx, ct, 1.0, tau))
        k += 1
    return ct


def normalized_mult_const(ctx: CKKSContext, ct: Ciphertext, value: complex,
                          prec_bits: int = 30) -> Ciphertext:
    """Multiply by `value` AND bring the result to the canonical scale of
    its depth, regardless of the input's (possibly exotic) scale — used by
    bootstrapping where mod-raise reinterprets the scale as ~q0.

    Chooses the smallest number of rescales j >= 1 such that the encoding
    scale tau = s_{k+j} * (q_{T-1}...q_{T-j}) / scale carries at least
    prec_bits of precision.
    """
    k = depth_of(ctx, ct)
    T = ct.towers
    j = 0
    tau = 0.0
    prod = 1.0
    while j < T - 1:
        j += 1
        prod *= ctx.q_moduli[T - j]
        tau = scale_at(ctx, k + j) * prod / ct.scale
        if tau >= 2.0 ** prec_bits:
            break
    assert tau >= 1.0, "cannot normalize: scale too large for chain"
    ct = mult_const(ctx, ct, value, tau)
    for _ in range(j):
        ct = ckks.rescale(ct)
    return ct


def add_auto(ctx: CKKSContext, ct1: Ciphertext, ct2: Ciphertext
             ) -> Ciphertext:
    k = max(depth_of(ctx, ct1), depth_of(ctx, ct2))
    return ckks.eval_add(adjust_depth(ctx, ct1, k), adjust_depth(ctx, ct2, k))


def sub_auto(ctx: CKKSContext, ct1: Ciphertext, ct2: Ciphertext
             ) -> Ciphertext:
    k = max(depth_of(ctx, ct1), depth_of(ctx, ct2))
    return ckks.eval_sub(adjust_depth(ctx, ct1, k), adjust_depth(ctx, ct2, k))


def mult_auto(ctx: CKKSContext, ct1: Ciphertext, ct2: Ciphertext,
              evk: keyswitch.KSKey) -> Ciphertext:
    """Multiply at canonical scales: result lands at depth k+1, scale
    s_{k+1} — the composable EvalMult."""
    k = max(depth_of(ctx, ct1), depth_of(ctx, ct2))
    a = adjust_depth(ctx, ct1, k)
    b = adjust_depth(ctx, ct2, k)
    return ckks.rescale(ckks.eval_mult_relin(a, b, evk))


def square_auto(ctx: CKKSContext, ct: Ciphertext,
                evk: keyswitch.KSKey) -> Ciphertext:
    return ckks.rescale(ckks.eval_square_relin(ct, evk))


def add_many(ctx: CKKSContext, cts: Sequence[Ciphertext]) -> Ciphertext:
    """Binary-tree sum (reference: EvalAddMany)."""
    cts = list(cts)
    while len(cts) > 1:
        nxt = [add_auto(ctx, cts[i], cts[i + 1])
               for i in range(0, len(cts) - 1, 2)]
        if len(cts) % 2:
            nxt.append(cts[-1])
        cts = nxt
    return cts[0]


def mult_many(ctx: CKKSContext, cts: Sequence[Ciphertext],
              evk: keyswitch.KSKey) -> Ciphertext:
    """Binary-tree product (reference: EvalMultMany)."""
    cts = list(cts)
    while len(cts) > 1:
        nxt = [mult_auto(ctx, cts[i], cts[i + 1], evk)
               for i in range(0, len(cts) - 1, 2)]
        if len(cts) % 2:
            nxt.append(cts[-1])
        cts = nxt
    return cts[0]


def linear_wsum(ctx: CKKSContext, cts: Sequence[Ciphertext],
                weights: Sequence[complex]) -> Ciphertext:
    """sum_j w_j * ct_j with one rescale at the end (reference:
    EvalLinearWSum). All cts are first brought to a common depth."""
    k = max(depth_of(ctx, c) for c in cts)
    cts = [adjust_depth(ctx, c, k) for c in cts]
    acc = None
    for w, c in zip(weights, cts):
        term = mult_const(ctx, c, w, scale_at(ctx, 0))
        acc = term if acc is None else ckks.eval_add(acc, term)
    return ckks.rescale(acc)


def add_const(ctx: CKKSContext, ct: Ciphertext, c: complex) -> Ciphertext:
    """ct + c with the constant encoded at the ct's exact scale."""
    pt = ckks.encode(ctx, np.full(ctx.params.num_slots, c),
                     towers=ct.towers, scale=ct.scale)
    from .. import dcrt
    return Ciphertext((dcrt.add(ct.polys[0], pt),) + ct.polys[1:], ct.scale)


def eval_poly(ctx: CKKSContext, ct: Ciphertext, coeffs: Sequence[float],
              evk: keyswitch.KSKey) -> Ciphertext:
    """Evaluate sum_j coeffs[j] * x^j (power basis) with log-depth powers
    (reference: EvalPoly/EvalPolyLinear)."""
    deg = len(coeffs) - 1
    assert deg >= 1
    powers = {1: ct}

    def power(j: int) -> Ciphertext:
        if j in powers:
            return powers[j]
        a = j // 2
        b = j - a
        p = mult_auto(ctx, power(a), power(b), evk)
        powers[j] = p
        return p

    terms = []
    for j in range(1, deg + 1):
        if coeffs[j] != 0:
            terms.append((coeffs[j], power(j)))
    k = max(depth_of(ctx, t[1]) for t in terms)
    acc = None
    for w, p in terms:
        term = mult_const(ctx, adjust_depth(ctx, p, k), w, scale_at(ctx, 0))
        acc = term if acc is None else ckks.eval_add(acc, term)
    acc = ckks.rescale(acc)
    if coeffs[0] != 0:
        acc = add_const(ctx, acc, coeffs[0])
    return acc


def eval_chebyshev(ctx: CKKSContext, ct: Ciphertext,
                   coeffs: Sequence[float], a: float, b: float,
                   evk: keyswitch.KSKey) -> Ciphertext:
    """Evaluate sum_j coeffs[j] * T_j(y), y = (2x - a - b)/(b - a), with
    log-depth T_j chains: T_{m+n} = 2 T_m T_n - T_{m-n}
    (reference: EvalChebyshevSeries / EvalChebyshevSeriesLinear).
    """
    deg = len(coeffs) - 1
    # affine map to [-1, 1]: y = scale*x + shift; normalized_mult_const
    # also canonicalizes exotic input scales (bootstrap mod-raise)
    scale = 2.0 / (b - a)
    shift = -(a + b) / (b - a)
    y = normalized_mult_const(ctx, ct, scale)
    y = add_const(ctx, y, shift)

    cheb = {1: y}

    def T(j: int) -> Ciphertext:
        if j in cheb:
            return cheb[j]
        m = (j + 1) // 2
        n = j - m  # m >= n, m - n in {0, 1}
        prod = mult_auto(ctx, T(m), T(n), evk)
        # x2: integer constant multiply (exact, no scale change)
        two = mult_const(ctx, prod, 2.0, 1.0)
        if m == n:
            res = add_const(ctx, two, -1.0)
        else:
            res = sub_auto(ctx, two, T(m - n))
        cheb[j] = res
        return res

    terms = [(coeffs[j], T(j)) for j in range(1, deg + 1)
             if abs(coeffs[j]) > 0]
    k = max(depth_of(ctx, t[1]) for t in terms)
    acc = None
    for w, p in terms:
        term = mult_const(ctx, adjust_depth(ctx, p, k), w, scale_at(ctx, 0))
        acc = term if acc is None else ckks.eval_add(acc, term)
    acc = ckks.rescale(acc)
    acc = add_const(ctx, acc, coeffs[0] if len(coeffs) > 0 else 0.0)
    return acc


def chebyshev_coefficients(fn, a: float, b: float, degree: int) -> np.ndarray:
    """Chebyshev interpolation coefficients of fn on [a, b]
    (reference: ckksrns-utils EvalChebyshevCoefficients)."""
    m = degree + 1
    j = np.arange(m)
    x_cheb = np.cos(np.pi * (j + 0.5) / m)
    x = 0.5 * (b - a) * x_cheb + 0.5 * (a + b)
    fvals = np.asarray([fn(v) for v in x])
    coeffs = np.zeros(m)
    for k in range(m):
        coeffs[k] = (2.0 / m) * np.sum(fvals * np.cos(np.pi * k * (j + 0.5) / m))
    coeffs[0] /= 2.0
    return coeffs
