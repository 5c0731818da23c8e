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


def canonicalize(ctx: CKKSContext, ct: Ciphertext) -> Ciphertext:
    """FLEXIBLEAUTOEXT entry adjustment (reference: the automatic first
    ModReduce of AUTOEXT fresh ciphertexts): a fresh ct carries scale
    2^(2p) on the extra tower; one rescale lands it exactly on the
    canonical chain (s_1 = 2^(2p) / q_{L-1})."""
    if (ctx.params.scaling_technique == "FLEXIBLEAUTOEXT"
            and depth_of(ctx, ct) == 0):
        return ckks.rescale(ct)
    return ct


def add_auto(ctx: CKKSContext, ct1: Ciphertext, ct2: Ciphertext
             ) -> Ciphertext:
    ct1, ct2 = canonicalize(ctx, ct1), canonicalize(ctx, ct2)
    k = max(depth_of(ctx, ct1), depth_of(ctx, ct2))
    return ckks.eval_add(adjust_depth(ctx, ct1, k), adjust_depth(ctx, ct2, k))


def sub_auto(ctx: CKKSContext, ct1: Ciphertext, ct2: Ciphertext
             ) -> Ciphertext:
    ct1, ct2 = canonicalize(ctx, ct1), canonicalize(ctx, ct2)
    k = max(depth_of(ctx, ct1), depth_of(ctx, ct2))
    return ckks.eval_sub(adjust_depth(ctx, ct1, k), adjust_depth(ctx, ct2, k))


def mult_auto(ctx: CKKSContext, ct1: Ciphertext, ct2: Ciphertext,
              evk: keyswitch.KSKey) -> Ciphertext:
    """Multiply at canonical scales: result lands at depth k+1, scale
    s_{k+1} — the composable EvalMult."""
    ct1, ct2 = canonicalize(ctx, ct1), canonicalize(ctx, ct2)
    k = max(depth_of(ctx, ct1), depth_of(ctx, ct2))
    a = adjust_depth(ctx, ct1, k)
    b = adjust_depth(ctx, ct2, k)
    return ckks.rescale(ckks.eval_mult_relin(a, b, evk))


# ---------------------------------------------------------------------------
# FIXEDAUTO (reference: ScalingTechnique FIXEDAUTO, constants.h:59-64):
# ops insert the rescale automatically, and every level's scaling factor is
# TREATED as the nominal 2^p (the documented approximation of the FIXED
# techniques — the per-level error is |q_i - 2^p| / 2^p).
# ---------------------------------------------------------------------------


def _fixed_deg(ctx: CKKSContext, ct: Ciphertext) -> int:
    return 2 if ct.scale > 1.5 * ctx.scale else 1


def _fixed_rescale(ctx: CKKSContext, ct: Ciphertext) -> Ciphertext:
    r = ckks.rescale_ctx(ctx, ct)
    return Ciphertext(r.polys, float(ctx.scale))   # snap to nominal 2^p


def _match_levels(ct1: Ciphertext, ct2: Ciphertext):
    if ct1.towers > ct2.towers:
        ct1 = ckks.level_reduce(ct1, ct1.towers - ct2.towers)
    elif ct2.towers > ct1.towers:
        ct2 = ckks.level_reduce(ct2, ct2.towers - ct1.towers)
    return ct1, ct2


def _fixed_align(ctx: CKKSContext, ct1: Ciphertext, ct2: Ciphertext):
    if _fixed_deg(ctx, ct1) == 2:
        ct1 = _fixed_rescale(ctx, ct1)
    if _fixed_deg(ctx, ct2) == 2:
        ct2 = _fixed_rescale(ctx, ct2)
    return _match_levels(ct1, ct2)


def mult_fixed_auto(ctx: CKKSContext, ct1: Ciphertext, ct2: Ciphertext,
                    evk: keyswitch.KSKey) -> Ciphertext:
    a, b = _fixed_align(ctx, ct1, ct2)
    out = ckks.eval_mult_relin(a, b, evk)
    return Ciphertext(out.polys, float(ctx.scale) ** 2)


def add_fixed_auto(ctx: CKKSContext, ct1: Ciphertext, ct2: Ciphertext
                   ) -> Ciphertext:
    a, b = _fixed_align(ctx, ct1, ct2)
    return ckks.eval_add(a, b)


def sub_fixed_auto(ctx: CKKSContext, ct1: Ciphertext, ct2: Ciphertext
                   ) -> Ciphertext:
    a, b = _fixed_align(ctx, ct1, ct2)
    return ckks.eval_sub(a, b)


# ---------------------------------------------------------------------------
# Technique dispatch: ONE public auto API whatever the context's configured
# ScalingTechnique (the reference's CryptoContext does this inside
# EvalMult/EvalAdd via LeveledSHECKKSRNS::EvalMult + AdjustLevelsAndDepths).
# ---------------------------------------------------------------------------


def eval_mult_auto(ctx: CKKSContext, ct1: Ciphertext, ct2: Ciphertext,
                   evk: keyswitch.KSKey) -> Ciphertext:
    if ctx.params.scaling_technique == "FIXEDAUTO":
        return mult_fixed_auto(ctx, ct1, ct2, evk)
    return mult_auto(ctx, ct1, ct2, evk)


def eval_add_auto(ctx: CKKSContext, ct1: Ciphertext, ct2: Ciphertext
                  ) -> Ciphertext:
    if ctx.params.scaling_technique == "FIXEDAUTO":
        return add_fixed_auto(ctx, ct1, ct2)
    return add_auto(ctx, ct1, ct2)


def eval_sub_auto(ctx: CKKSContext, ct1: Ciphertext, ct2: Ciphertext
                  ) -> Ciphertext:
    if ctx.params.scaling_technique == "FIXEDAUTO":
        return sub_fixed_auto(ctx, ct1, ct2)
    return sub_auto(ctx, ct1, ct2)


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


def eval_chebyshev_ps(ctx: CKKSContext, ct: Ciphertext,
                      coeffs: Sequence[float], a: float, b: float,
                      evk: keyswitch.KSKey) -> Ciphertext:
    """Paterson-Stockmeyer evaluation of sum_j coeffs[j] T_j(y),
    y = (2x - a - b)/(b - a): ~sqrt(2 deg) ct-ct mults instead of deg
    (reference: EvalChebyshevSeriesPS, ckksrns-utils.cpp
    InnerEvalChebyshevPS/LongDivisionChebyshev; the division here uses
    numpy's exact Chebyshev-basis long division)."""
    from numpy.polynomial import chebyshev as C

    coeffs = np.asarray(coeffs, dtype=np.float64)
    deg = len(coeffs) - 1
    if deg <= 4:
        return eval_chebyshev(ctx, ct, coeffs, a, b, evk)

    scale = 2.0 / (b - a)
    shift = -(a + b) / (b - a)
    y = normalized_mult_const(ctx, ct, scale)
    y = add_const(ctx, y, shift)

    # baby set T_1..T_k and giants G_i = T_{k 2^i}, i = 0..m-1
    k = max(2, int(np.ceil(np.sqrt(deg / 2.0))))
    m = 1
    while k * (1 << m) <= deg:
        m += 1

    T = {1: y}

    def baby(j: int) -> Ciphertext:
        if j in T:
            return T[j]
        hi = (j + 1) // 2
        lo = j - hi
        prod = mult_auto(ctx, baby(hi), baby(lo), evk)
        two = mult_const(ctx, prod, 2.0, 1.0)
        T[j] = (add_const(ctx, two, -1.0) if hi == lo
                else sub_auto(ctx, two, baby(hi - lo)))
        return T[j]

    G = [baby(k)]
    for _ in range(1, m):
        sq = square_auto(ctx, G[-1], evk)
        G.append(add_const(ctx, mult_const(ctx, sq, 2.0, 1.0), -1.0))

    def leaf(c: np.ndarray) -> Ciphertext | float:
        """Linear combination of baby T's (degree < k); returns a float
        when the polynomial is constant."""
        c = np.trim_zeros(np.asarray(c, dtype=np.float64), "b")
        if len(c) == 0:
            return 0.0
        if len(c) == 1:
            return float(c[0])
        terms = [(c[j], baby(j)) for j in range(1, len(c))
                 if abs(c[j]) > 1e-300]
        kd = max(depth_of(ctx, t[1]) for t in terms)
        acc = None
        for w, p in terms:
            # encode at s_kd so the rescaled sum lands at the CANONICAL
            # scale s_{kd+1} = s_kd^2/q (node() feeds this to mult_auto)
            t = mult_const(ctx, adjust_depth(ctx, p, kd), w,
                           scale_at(ctx, kd))
            acc = t if acc is None else ckks.eval_add(acc, t)
        acc = ckks.rescale(acc)
        if abs(c[0]) > 1e-300:
            acc = add_const(ctx, acc, float(c[0]))
        return acc

    def node(c: np.ndarray) -> Ciphertext | float:
        c = np.trim_zeros(np.asarray(c, dtype=np.float64), "b")
        d = len(c) - 1
        if d < k:
            return leaf(c)
        # largest giant T_M, M = k 2^i, with M <= d
        i = min(m - 1, int(np.floor(np.log2(d / k))))
        M = k << i
        tm = np.zeros(M + 1)
        tm[M] = 1.0
        q, r = C.chebdiv(c, tm)
        qv, rv = node(q), node(r)
        if isinstance(qv, float):
            kg = depth_of(ctx, G[i])
            prod = ckks.rescale(mult_const(ctx, G[i], qv, scale_at(ctx, kg)))
        else:
            prod = mult_auto(ctx, qv, G[i], evk)
        if isinstance(rv, float):
            return add_const(ctx, prod, rv)
        return add_auto(ctx, prod, rv)

    out = node(coeffs)
    assert isinstance(out, Ciphertext)
    return out


# ---------------------------------------------------------------------------
# EvalSum / inner product / merge / negate
# (reference: AdvancedSHEBase::EvalSum/EvalInnerProduct/EvalMerge,
# base-advancedshe.cpp; cryptocontext.h EvalSumKeyGen)
# ---------------------------------------------------------------------------


def sum_rotation_indices(batch: int) -> list:
    """Keys needed by eval_sum over a power-of-two batch: 1, 2, 4, ..."""
    assert batch & (batch - 1) == 0, "batch size must be a power of two"
    return [1 << i for i in range(batch.bit_length() - 1)]


def eval_sum(ctx: CKKSContext, ct: Ciphertext, batch: int,
             rot_keys) -> Ciphertext:
    """Every slot of each batch-aligned block becomes the block sum
    (rotation tree, log2(batch) rotations; reference: EvalSum)."""
    out = ct
    for r in sum_rotation_indices(batch):
        out = ckks.eval_add(out, ckks.eval_rotate(out, r, rot_keys[r]))
    return out


def eval_inner_product(ctx: CKKSContext, ct1: Ciphertext, ct2: Ciphertext,
                       batch: int, evk: keyswitch.KSKey,
                       rot_keys) -> Ciphertext:
    """<ct1, ct2> over the first ``batch`` slots, result replicated across
    the batch (reference: EvalInnerProduct)."""
    return eval_sum(ctx, mult_auto(ctx, ct1, ct2, evk), batch, rot_keys)


def eval_merge(ctx: CKKSContext, cts: Sequence[Ciphertext],
               rot_keys) -> Ciphertext:
    """Merge slot 0 of each ct_i into slot i of one ciphertext
    (reference: EvalMerge: mask to e_0, rotate by -i, sum)."""
    mask = np.zeros(ctx.params.num_slots)
    mask[0] = 1.0
    acc = None
    for i, ct in enumerate(cts):
        t = ckks.rescale(ckks.eval_mult_plain(ctx, ct, mask))
        if i > 0:
            r = ctx.params.num_slots - i  # rotate by -i
            t = ckks.eval_rotate(t, r, rot_keys[r])
        acc = t if acc is None else add_auto(ctx, acc, t)
    return acc


def eval_negate(ct: Ciphertext) -> Ciphertext:
    """-ct (reference: EvalNegate)."""
    from .. import dcrt
    return Ciphertext(tuple(dcrt.neg(p) for p in ct.polys), ct.scale)


# ---------------------------------------------------------------------------
# Chebyshev function evaluation wrappers
# (reference: cryptocontext.h EvalLogistic/EvalDivide/EvalSin/EvalCos/
# EvalSqrt -> EvalChebyshevFunction, ckksrns-utils)
# ---------------------------------------------------------------------------


def eval_chebyshev_function(ctx: CKKSContext, fn, ct: Ciphertext,
                            a: float, b: float, degree: int,
                            evk: keyswitch.KSKey) -> Ciphertext:
    coeffs = chebyshev_coefficients(fn, a, b, degree)
    return eval_chebyshev_ps(ctx, ct, coeffs, a, b, evk)


def eval_logistic(ctx, ct, a, b, degree, evk):
    return eval_chebyshev_function(
        ctx, lambda x: 1.0 / (1.0 + np.exp(-x)), ct, a, b, degree, evk)


def eval_divide(ctx, ct, a, b, degree, evk):
    assert a * b > 0, "interval must exclude 0"
    return eval_chebyshev_function(ctx, lambda x: 1.0 / x, ct, a, b,
                                   degree, evk)


def eval_sin(ctx, ct, a, b, degree, evk):
    return eval_chebyshev_function(ctx, np.sin, ct, a, b, degree, evk)


def eval_cos(ctx, ct, a, b, degree, evk):
    return eval_chebyshev_function(ctx, np.cos, ct, a, b, degree, evk)


def eval_sqrt(ctx, ct, a, b, degree, evk):
    assert a >= 0
    return eval_chebyshev_function(ctx, np.sqrt, ct, a, b, degree, evk)
