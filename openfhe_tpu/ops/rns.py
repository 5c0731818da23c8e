"""RNS (Residue Number System) basis toolkit.

Re-implements the mathematical content of the reference's DCRTPoly RNS
tool-kit (``lattice/hal/default/dcrtpoly-impl.h``): ApproxSwitchCRTBasis
(:1034), ApproxModUp (:1085), ApproxModDown (:1134), DropLastElementAndScale
(:746), ModReduce/BGV (:792) — as pure array functions on U64 residue stacks.

TPU-first realization: the reference's per-coefficient OpenMP loop with
128-bit accumulators becomes a broadcasted tower-product followed by a
modular tree-reduction: every term [x_i * QHatInv_i]_{q_i} * [QHat_i]_{p_j}
is a Shoup constant-multiply (the constants are host-precomputed exact
tables), and the sum over i is folded mod p_j. Summing residues mod p_j is
value-identical to the reference's lazy 128-bit accumulation followed by
one Barrett reduction, because both reduce the same exact integer mod p_j.

All tables are cached per (from_basis, to_basis) pair and live as device
constants captured by jit.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..utils import nbtheory
from .limb import U64, add64, add64_carry, from_int, from_int_array, mul64_full
from .modular import (
    add_mod,
    add_mod32,
    barrett_word,
    is_u32_moduli,
    make_mod_consts,
    make_mod_consts32,
    mul_mod_shoup,
    mul_mod_shoup32,
    shoup_precon_int,
    sub_mod,
    sub_mod32,
    switch_modulus,
    switch_modulus32,
)


def _zero_hi(lo) -> U64:
    return U64(lo, jnp.zeros_like(lo))


def _const_table(values, shape, moduli_for_precon=None):
    """Pack python-int table -> (U64 values, U64 Shoup precons or None)."""
    vals = from_int_array(np.asarray(values, dtype=object).reshape(shape))
    if moduli_for_precon is None:
        return vals, None
    pre = [shoup_precon_int(int(v), int(q))
           for v, q in zip(np.asarray(values, dtype=object).ravel(),
                           np.asarray(moduli_for_precon, dtype=object).ravel())]
    pres = from_int_array(np.asarray(pre, dtype=object).reshape(shape))
    return vals, pres


@lru_cache(maxsize=None)
def switch_basis_tables(from_moduli: tuple, to_moduli: tuple):
    """Tables for ApproxSwitchCRTBasis from basis Q={q_i} to P={p_j}.

    Returns (qhat_inv [L,1] with precon mod q_i, qhat_modp [K,L,1] with
    precon mod p_j, mod consts for P shaped [K,1]).
    """
    Q = 1
    for q in from_moduli:
        Q *= q
    L, K = len(from_moduli), len(to_moduli)
    qhat = [Q // q for q in from_moduli]
    qhat_inv = [pow(h, -1, q) for h, q in zip(qhat, from_moduli)]
    qi_rep = [[q] for q in from_moduli]
    qhi, qhi_pre = _const_table([[v] for v in qhat_inv], (L, 1), qi_rep)
    table = [[[qhat[i] % p] for i in range(L)] for p in to_moduli]
    prec_mods = [[[p] for _ in range(L)] for p in to_moduli]
    qh_p, qh_p_pre = _const_table(table, (K, L, 1), prec_mods)
    to_mod = make_mod_consts(to_moduli, trailing_dims=1)
    return (qhi, qhi_pre), (qh_p, qh_p_pre), to_mod


def approx_switch_basis(x: U64, from_moduli: tuple, to_moduli: tuple) -> U64:
    """HPS approximate CRT basis switch of residue stack x [L, n] -> [K, n].

    y_j = sum_i [x_i * QHatInv_i]_{q_i} * [QHat_i]_{p_j}  (mod p_j)

    Exact-match to the reference's ApproxSwitchCRTBasis
    (``dcrtpoly-impl.h:1034-1061``) semantics. Must be applied to
    COEFFICIENT-domain residues to be meaningful.
    """
    from_moduli, to_moduli = tuple(from_moduli), tuple(to_moduli)
    (qhi, qhi_pre), (qh_p, qh_p_pre), to_mod = switch_basis_tables(
        from_moduli, to_moduli)
    L = len(from_moduli)
    if is_u32_moduli(from_moduli) and is_u32_moduli(to_moduli):
        if L >= 6:
            # MXU digit-matmul formulation: bit-exact and measured faster
            # at every keyswitch shape once the tower MAC is deep enough
            # to amortize the 9 weight recombinations (tpu_mxu_bench.py,
            # NTT_PERF.md round 5: 16->6 13.3 vs 62.0 us VPU).
            from . import rns_mxu
            return rns_mxu.approx_switch_basis_mxu(x, from_moduli,
                                                   to_moduli)
        # single-limb u32 fast path: the 64-bit Shoup precon's hi plane IS
        # the 32-bit precon (floor(floor(c*2^64/q)/2^32) = floor(c*2^32/q)),
        # and mul_mod_shoup32 is valid for ANY u32 multiplicand, so y_i >=
        # p_j is fine. ~6 native multiplies per term vs ~28 emulated.
        qf32 = make_mod_consts32(from_moduli).q
        qt32 = make_mod_consts32(to_moduli).q
        y = mul_mod_shoup32(x.lo, qhi.lo, qhi_pre.hi, qf32)
        acc = None
        for i in range(L):
            term = mul_mod_shoup32(y[i][None, :], qh_p.lo[:, i],
                                   qh_p_pre.hi[:, i], qt32)
            acc = term if acc is None else add_mod32(acc, term, qt32)
        return _zero_hi(acc)
    from_mod = make_mod_consts(from_moduli, trailing_dims=1)
    # step 1: y_i = [x_i * QHatInv_i]_{q_i}   [L, n]
    y = mul_mod_shoup(x, qhi, qhi_pre, from_mod.q)
    # step 2: terms_{j,i} = y_i * [QHat_i]_{p_j} mod p_j, summed over i.
    # Loop towers in Python (L small) to keep the working set at [K, n].
    qK = U64(to_mod.q.lo, to_mod.q.hi)  # [K, 1]
    acc = None
    for i in range(L):
        yi = U64(y.lo[i][None, :], y.hi[i][None, :])  # [1, n]
        c = U64(qh_p.lo[:, i], qh_p.hi[:, i])          # [K, 1]
        cp = U64(qh_p_pre.lo[:, i], qh_p_pre.hi[:, i])
        term = mul_mod_shoup(yi, c, cp, qK)            # [K, n]
        acc = term if acc is None else add_mod(acc, term, qK)
    return acc


@lru_cache(maxsize=None)
def _mod_down_tables(q_moduli: tuple, p_moduli: tuple, t: int):
    """Tables for ApproxModDown: P^{-1} mod q_i, plus (for BGV, t > 1)
    t^{-1} mod p_j and t mod q_i Shoup constants."""
    P = 1
    for p in p_moduli:
        P *= p
    pinv = [[pow(P % q, -1, q)] for q in q_moduli]
    vals, pres = _const_table(pinv, (len(q_moduli), 1), [[q] for q in q_moduli])
    qmod = make_mod_consts(q_moduli, trailing_dims=1)
    pmod = make_mod_consts(p_moduli, trailing_dims=1)
    if t == 1:
        return vals, pres, qmod, None
    tinv_p = _const_table([[pow(t % p, -1, p)] for p in p_moduli],
                          (len(p_moduli), 1), [[p] for p in p_moduli])
    t_q = _const_table([[t % q] for q in q_moduli],
                       (len(q_moduli), 1), [[q] for q in q_moduli])
    return vals, pres, qmod, (tinv_p, t_q, pmod)


def approx_mod_down(x_q: U64, x_p: U64, q_moduli: tuple, p_moduli: tuple,
                    t: int = 1) -> U64:
    """Scale x (over Q*P, given as its Q-part [L,n] and P-part [K,n], both in
    COEFFICIENT domain) by 1/P: out_i = (x_i - V_i) * P^{-1} mod q_i where
    V ≡ x (mod P).

    For BGV (t > 1) the lift V must also be ≡ 0 (mod t) so the rounding
    error stays a multiple of the plaintext modulus: V = t*conv(t^{-1}*x_p)
    (the reference's t-aware ApproxModDown with tInvModp/tModqPrecon tables).
    Reference: ApproxModDown (``dcrtpoly-impl.h:1134``).
    """
    q_moduli, p_moduli = tuple(q_moduli), tuple(p_moduli)
    pinv, pinv_pre, qmod, t_tabs = _mod_down_tables(q_moduli, p_moduli, t)
    if is_u32_moduli(q_moduli) and is_u32_moduli(p_moduli):
        q32 = make_mod_consts32(q_moduli).q
        p32 = make_mod_consts32(p_moduli).q
        xp_lo = x_p.lo
        if t_tabs is not None:
            (tinv, tinv_pre), (tq, tq_pre), pmod = t_tabs
            xp_lo = mul_mod_shoup32(xp_lo, tinv.lo, tinv_pre.hi, p32)
        conv = approx_switch_basis(_zero_hi(xp_lo), p_moduli, q_moduli).lo
        if t_tabs is not None:
            conv = mul_mod_shoup32(conv, tq.lo, tq_pre.hi, q32)
        diff = sub_mod32(x_q.lo, conv, q32)
        return _zero_hi(mul_mod_shoup32(diff, pinv.lo, pinv_pre.hi, q32))
    if t_tabs is not None:
        (tinv, tinv_pre), (tq, tq_pre), pmod = t_tabs
        x_p = mul_mod_shoup(x_p, tinv, tinv_pre, pmod.q)
    conv = approx_switch_basis(x_p, p_moduli, q_moduli)
    if t_tabs is not None:
        conv = mul_mod_shoup(conv, tq, tq_pre, qmod.q)
    diff = sub_mod(x_q, conv, qmod.q)
    return mul_mod_shoup(diff, pinv, pinv_pre, qmod.q)


@lru_cache(maxsize=None)
def _drop_scale_tables(moduli: tuple):
    """[q_last^{-1}]_{q_i} for i < last, as [L-1,1] Shoup constants."""
    *rest, q_last = moduli
    inv = [[pow(q_last % q, -1, q)] for q in rest]
    vals, pres = _const_table(inv, (len(rest), 1), [[q] for q in rest])
    new_mod = make_mod_consts(tuple(rest), trailing_dims=1)
    old_mod = make_mod_consts((q_last,), trailing_dims=1)
    return vals, pres, new_mod, old_mod


def rescale_eval(x: U64, moduli: tuple) -> U64:
    """Divide-and-round by the last modulus for an EVALUATION-domain stack.

    Only the last tower round-trips through the coefficient domain (one
    single-tower iNTT + L-1 forward NTTs), mirroring the structure of the
    reference's ModReduce path (rescale cost ~ L NTTs, not 2L).
    """
    from . import ntt as _ntt  # local import to keep module load light

    moduli = tuple(moduli)
    inv, inv_pre, new_mod, old_mod = _drop_scale_tables(moduli)
    L = len(moduli)
    x_last = U64(x.lo[L - 1][None, :], x.hi[L - 1][None, :])
    last_plan = _ntt.make_plan(x.lo.shape[-1], (moduli[-1],))
    x_last_coeff = _ntt.inverse(last_plan, x_last)
    rest_plan = _ntt.make_plan(x.lo.shape[-1], moduli[:-1])
    if is_u32_moduli(moduli):
        old32 = make_mod_consts32((moduli[-1],))
        new32 = make_mod_consts32(moduli[:-1])
        s = switch_modulus32(x_last_coeff.lo, old32, new32)
        s_eval = _ntt.forward(rest_plan, _zero_hi(s)).lo
        diff = sub_mod32(x.lo[: L - 1], s_eval, new32.q)
        return _zero_hi(mul_mod_shoup32(diff, inv.lo, inv_pre.hi, new32.q))
    x_rest = U64(x.lo[: L - 1], x.hi[: L - 1])
    s = switch_modulus(x_last_coeff, old_mod, new_mod)  # [L-1, n] coeff
    s_eval = _ntt.forward(rest_plan, s)
    diff = sub_mod(x_rest, s_eval, new_mod.q)
    return mul_mod_shoup(diff, inv, inv_pre, new_mod.q)


def drop_last_and_scale(x: U64, moduli: tuple) -> U64:
    """Exact divide-and-round by the last modulus, in COEFFICIENT domain:
    out_i = [q_last^{-1} * (x_i - centered(x_last))]_{q_i}, i < last.

    This equals round(x / q_last) mapped into the smaller basis — the CKKS
    rescale / core of BGV mod-reduce (reference: DropLastElementAndScale,
    ``dcrtpoly-impl.h:746``).
    """
    moduli = tuple(moduli)
    inv, inv_pre, new_mod, old_mod = _drop_scale_tables(moduli)
    L = len(moduli)
    if is_u32_moduli(moduli):
        old32 = make_mod_consts32((moduli[-1],))
        new32 = make_mod_consts32(moduli[:-1])
        s = switch_modulus32(x.lo[L - 1][None, :], old32, new32)
        diff = sub_mod32(x.lo[: L - 1], s, new32.q)
        return _zero_hi(mul_mod_shoup32(diff, inv.lo, inv_pre.hi, new32.q))
    x_rest = U64(x.lo[: L - 1], x.hi[: L - 1])
    x_last = U64(x.lo[L - 1][None, :], x.hi[L - 1][None, :])
    # centered switch of the last tower into each remaining modulus
    s = switch_modulus(x_last, old_mod, new_mod)  # [L-1, n]
    diff = sub_mod(x_rest, s, new_mod.q)
    return mul_mod_shoup(diff, inv, inv_pre, new_mod.q)


# ---------------------------------------------------------------------------
# BFV machinery: HPS scale-and-round and exact CRT basis switch.
#
# Fractional parts are carried in 64-bit fixed point with 128-bit
# accumulation — strictly more precise than the reference's double-precision
# lazy accumulation (``dcrtpoly-impl.h:1876`` ScaleAndRound; ``:1178``
# SwitchCRTBasis with double-based overflow count).
# ---------------------------------------------------------------------------


def _accum_128(terms):
    """Sum of (lo: U64, hi: U64) 128-bit values; returns (lo, hi)."""
    acc_lo, acc_hi = terms[0]
    for lo, hi in terms[1:]:
        acc_lo, carry = add64_carry(acc_lo, lo)
        acc_hi = add64(add64(acc_hi, hi), U64(carry, jnp.zeros_like(carry)))
    return acc_lo, acc_hi


def _round_shift_64(acc_lo: U64, acc_hi: U64) -> U64:
    """round(A / 2^64) for a 128-bit A = (lo, hi): hi + (lo >= 2^63)."""
    half_bit = (acc_lo.hi >> 31).astype(jnp.uint32)
    return add64(acc_hi, U64(half_bit, jnp.zeros_like(half_bit)))


@lru_cache(maxsize=None)
def _scale_round_tables(s_moduli: tuple, r_moduli: tuple, t: int,
                        q_moduli: tuple):
    """Tables for round(t*X/Q) mod r_j, X over S, Q = prod(q_moduli) ⊆ S."""
    S = 1
    for s in s_moduli:
        S *= s
    Q = 1
    for q in q_moduli:
        Q *= q
    assert S % Q == 0, "Q must divide the S-product"
    Rt = t * (S // Q)
    for r in r_moduli:
        assert Rt % r == 0, "overflow term t*S/Q must vanish mod each target"
    # \hat{S}_s^{-1} mod s
    shat_inv = [pow((S // s) % s, -1, s) for s in s_moduli]
    sinv, sinv_pre = _const_table([[v] for v in shat_inv],
                                  (len(s_moduli), 1), [[s] for s in s_moduli])
    # t*\hat{S}_s/Q = omega_s + theta_s
    omegas, phis = [], []
    for s in s_moduli:
        # exact integer and fractional split of t*\hat{S}_s/Q, \hat{S}_s = S/s
        num = t * (S // s)
        den = Q
        omega = num // den
        frac_num = num - omega * den
        phi = (frac_num << 64) // den
        # round-to-nearest of theta*2^64
        if 2 * ((frac_num << 64) % den) >= den:
            phi += 1
        omegas.append(omega)
        phis.append(phi)
    om_rows = [[[om % r] for om in omegas] for r in r_moduli]
    om_pre = [[[shoup_precon_int(om % r, r)] for om in omegas]
              for r in r_moduli]
    K, L = len(r_moduli), len(s_moduli)
    om_t = from_int_array(np.asarray(om_rows, dtype=object).reshape(K, L, 1))
    om_p = from_int_array(np.asarray(om_pre, dtype=object).reshape(K, L, 1))
    phi_t = from_int_array(np.asarray([[p] for p in phis],
                                      dtype=object).reshape(L, 1))
    s_mod = make_mod_consts(s_moduli, trailing_dims=1)
    r_mod = make_mod_consts(r_moduli, trailing_dims=1)
    return (sinv, sinv_pre), (om_t, om_p), phi_t, s_mod, r_mod


def scale_and_round(x: U64, s_moduli: tuple, r_moduli: tuple, t: int,
                    q_moduli: tuple) -> U64:
    """round(t * X / Q) mod r_j for X given over basis S (COEFF domain),
    Q = prod(q_moduli) (must divide prod(S)); output over r_moduli.

    out_j = sum_s xhat_s*floor(t*Shat_s/Q) + round(sum_s xhat_s*theta_s)
    with xhat_s = [x_s * Shat_s^{-1}]_s. The overflow term v*t*S/Q vanishes
    mod every r_j by the assert in table construction.
    (Reference: DCRTPolyImpl::ScaleAndRound overloads,
    ``dcrtpoly-impl.h:1537,1876,2005``.)
    """
    s_moduli, r_moduli, q_moduli = map(tuple, (s_moduli, r_moduli, q_moduli))
    (sinv, sinv_pre), (om_t, om_p), phi_t, s_mod, r_mod = _scale_round_tables(
        s_moduli, r_moduli, t, q_moduli)
    xhat = mul_mod_shoup(x, sinv, sinv_pre, s_mod.q)  # [L, n]
    L, K = len(s_moduli), len(r_moduli)
    # fractional accumulation in 128-bit
    frac_terms = []
    for i in range(L):
        xi = U64(xhat.lo[i], xhat.hi[i])
        phi = U64(phi_t.lo[i], phi_t.hi[i])
        frac_terms.append(mul64_full(xi, phi))
    acc_lo, acc_hi = _accum_128(frac_terms)
    rt = _round_shift_64(acc_lo, acc_hi)
    round_term = U64(rt.lo[None, :], rt.hi[None, :])      # [1, n]
    rt_mod = barrett_word(round_term, r_mod.q, r_mod.mu)  # [K, n]
    acc = rt_mod
    for i in range(L):
        xi = U64(xhat.lo[i][None, :], xhat.hi[i][None, :])
        c = U64(om_t.lo[:, i], om_t.hi[:, i])
        cp = U64(om_p.lo[:, i], om_p.hi[:, i])
        acc = add_mod(acc, mul_mod_shoup(xi, c, cp, r_mod.q), r_mod.q)
    return acc


@lru_cache(maxsize=None)
def _exact_switch_tables(from_moduli: tuple, to_moduli: tuple):
    R = 1
    for r in from_moduli:
        R *= r
    rhat_inv = [pow((R // r) % r, -1, r) for r in from_moduli]
    rinv, rinv_pre = _const_table([[v] for v in rhat_inv],
                                  (len(from_moduli), 1),
                                  [[r] for r in from_moduli])
    # 1/r_j in base-2^64 fixed point with TWO fractional limbs (128 bits):
    # a single limb of floor(2^64/r) has only ~4 significant bits for 60-bit
    # moduli, which would corrupt the overflow count with probability ~2^-4.
    d1s = [(1 << 64) // r for r in from_moduli]
    d2s = [((1 << 128) // r) & ((1 << 64) - 1) for r in from_moduli]
    phi_t = (from_int_array(np.asarray([[d] for d in d1s], dtype=object)),
             from_int_array(np.asarray([[d] for d in d2s], dtype=object)))
    K, L = len(to_moduli), len(from_moduli)
    rh_rows = [[[(R // r) % q] for r in from_moduli] for q in to_moduli]
    rh_pre = [[[shoup_precon_int((R // r) % q, q)] for r in from_moduli]
              for q in to_moduli]
    rh_t = from_int_array(np.asarray(rh_rows, dtype=object).reshape(K, L, 1))
    rh_p = from_int_array(np.asarray(rh_pre, dtype=object).reshape(K, L, 1))
    rmodq = [[R % q] for q in to_moduli]
    rmodq_pre = [[shoup_precon_int(R % q, q)] for q in to_moduli]
    rq_t = from_int_array(np.asarray(rmodq, dtype=object))
    rq_p = from_int_array(np.asarray(rmodq_pre, dtype=object))
    from_mod = make_mod_consts(from_moduli, trailing_dims=1)
    to_mod = make_mod_consts(to_moduli, trailing_dims=1)
    return (rinv, rinv_pre), phi_t, (rh_t, rh_p), (rq_t, rq_p), from_mod, to_mod


def exact_switch_basis(x: U64, from_moduli: tuple, to_moduli: tuple,
                       centered: bool = False) -> U64:
    """EXACT CRT basis switch (with overflow-count correction):
    out_i = sum_j xhat_j*[Rhat_j]_{q_i} - v*[R]_{q_i}, v = floor(sum xhat_j/r_j).

    (Reference: DCRTPolyImpl::SwitchCRTBasis, ``dcrtpoly-impl.h:1178``.)

    With ``centered=True`` the overflow count rounds to NEAREST (the
    reference starts its estimate at nu = 0.5), so residues encoding a
    SIGNED value v with |v| < R/2 switch to that signed value mod the new
    basis — required wherever the represented quantity can be negative
    (e.g. round(t*X/Q) of a negacyclic tensor in BFV EvalMult). The
    default floor keeps positive-lift semantics for in-range values.
    """
    from_moduli, to_moduli = tuple(from_moduli), tuple(to_moduli)
    (rinv, rinv_pre), phi_t, (rh_t, rh_p), (rq_t, rq_p), from_mod, to_mod = \
        _exact_switch_tables(from_moduli, to_moduli)
    xhat = mul_mod_shoup(x, rinv, rinv_pre, from_mod.q)
    L = len(from_moduli)
    d1_t, d2_t = phi_t
    # v = floor(sum_j xhat_j * (d1_j*2^64 + d2_j) / 2^128): 192-bit accum
    # as three u64 limbs (a0, a1, a2); v = a2*2^64 + a1... (< |R|, fits a1).
    zeros = U64(jnp.zeros_like(xhat.lo[0]), jnp.zeros_like(xhat.hi[0]))
    a0, a1, a2 = zeros, zeros, zeros
    if centered:
        # + 2^127 into the fixed-point accumulator == +1/2 on the count
        a1 = U64(jnp.zeros_like(a1.lo),
                 jnp.full_like(a1.hi, jnp.uint32(1 << 31)))
    for j in range(L):
        xj = U64(xhat.lo[j], xhat.hi[j])
        d1 = U64(d1_t.lo[j], d1_t.hi[j])
        d2 = U64(d2_t.lo[j], d2_t.hi[j])
        p1_lo, p1_hi = mul64_full(xj, d2)   # weight 2^0
        p0_lo, p0_hi = mul64_full(xj, d1)   # weight 2^64
        a0, c0 = add64_carry(a0, p1_lo)
        a1, c1 = add64_carry(a1, add64(p1_hi, U64(c0, jnp.zeros_like(c0))))
        a1, c2 = add64_carry(a1, p0_lo)
        a2 = add64(a2, add64(p0_hi, U64(c1 + c2, jnp.zeros_like(c1))))
    v = add64(a2, zeros)  # floor(A / 2^128); a2 < |R| so low limb suffices
    v2 = U64(v.lo[None, :], v.hi[None, :])
    acc = None
    for j in range(L):
        xj = U64(xhat.lo[j][None, :], xhat.hi[j][None, :])
        c = U64(rh_t.lo[:, j], rh_t.hi[:, j])
        cp = U64(rh_p.lo[:, j], rh_p.hi[:, j])
        term = mul_mod_shoup(xj, c, cp, to_mod.q)
        acc = term if acc is None else add_mod(acc, term, to_mod.q)
    vr = mul_mod_shoup(v2, rq_t, rq_p, to_mod.q)
    return sub_mod(acc, vr, to_mod.q)


# ---------------------------------------------------------------------------
# BEHZ (Bajard-Eynard-Hasan-Zucca) BFV multiplication machinery.
# Reference: FastBaseConvqToBskMontgomery (dcrtpoly-impl.h:2069),
# FastRNSFloorq, FastBaseConvSK (:2309). All conversions are exact integer
# identities (Montgomery / Shenoy-Kumaresan corrections) — no floating
# point — realized as the same Shoup-constant tower MACs as the HPS path.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _behz_mont_tables(q_moduli: tuple, bsk_moduli: tuple, m_tilde: int):
    """Tables for the Montgomery base conversion Q -> Bsk."""
    Q = 1
    for q in q_moduli:
        Q *= q
    k = len(bsk_moduli)
    mt_rep = [[m_tilde % q] for q in q_moduli]
    mt, mt_pre = _const_table(mt_rep, (len(q_moduli), 1),
                              [[q] for q in q_moduli])
    # Q^{-1} mod m_tilde (scalar). The m_tilde channel sees
    # (alpha - floor(m_tilde*x/Q)) * Q mod m_tilde, so multiplying by
    # Q^{-1} recovers the overflow correction only MOD m_tilde: the
    # final output is x or x - Q (mirror of the reference's centered
    # x or x + Q, dcrtpoly-impl.h:2069 SmMRq), an extension error the
    # downstream BEHZ flooring tolerates by construction.
    qinv_mt = pow(Q % m_tilde, -1, m_tilde)
    q_modb = _const_table([[Q % b] for b in bsk_moduli], (k, 1),
                          [[b] for b in bsk_moduli])
    mt_inv_b = _const_table([[pow(m_tilde % b, -1, b)] for b in bsk_moduli],
                            (k, 1), [[b] for b in bsk_moduli])
    bsk_mod = make_mod_consts(bsk_moduli, trailing_dims=1)
    return (mt, mt_pre), qinv_mt, q_modb, mt_inv_b, bsk_mod


def base_conv_q_to_bsk_montgomery(x: U64, q_moduli: tuple,
                                  bsk_moduli: tuple,
                                  m_tilde: int = 1 << 16) -> U64:
    """Exact base conversion of x [L, n] over Q (representatives in
    [0, Q)) to Bsk [k, n]: FastBConv of m_tilde*x, then a small Montgomery
    reduction removes the alpha*Q overflow (reference:
    FastBaseConvqToBskMontgomery, dcrtpoly-impl.h:2069)."""
    q_moduli, bsk_moduli = tuple(q_moduli), tuple(bsk_moduli)
    (mt, mt_pre), qinv_mt, (qb, qb_pre), (mtib, mtib_pre), bsk_mod = \
        _behz_mont_tables(q_moduli, bsk_moduli, m_tilde)
    q_mod = make_mod_consts(q_moduli, trailing_dims=1)
    xm = mul_mod_shoup(x, mt, mt_pre, q_mod.q)       # m_tilde * x mod Q
    # FastBConv into Bsk and into {m_tilde} (one fused conversion)
    ext = bsk_moduli + (m_tilde,)
    conv = approx_switch_basis(xm, q_moduli, ext)    # [k+1, n]
    k = len(bsk_moduli)
    y_bsk = U64(conv.lo[:k], conv.hi[:k])
    y_mt = U64(conv.lo[k:], conv.hi[k:])             # [1, n], < m_tilde
    # alpha_hat = y_mt * Q^{-1} mod m_tilde: the overflow correction
    # known only mod m_tilde (see _behz_mont_tables) -> out is x or x - Q
    mt_mod = make_mod_consts((m_tilde,), trailing_dims=1)
    nq, nq_pre = _const_table([[qinv_mt]], (1, 1), [[m_tilde]])
    alpha = mul_mod_shoup(y_mt, nq, nq_pre, mt_mod.q)  # [1, n]
    # out_j = (y_bsk_j - alpha * Q) * m_tilde^{-1} mod b_j
    aq = mul_mod_shoup(U64(jnp.broadcast_to(alpha.lo, y_bsk.lo.shape),
                           jnp.broadcast_to(alpha.hi, y_bsk.hi.shape)),
                       qb, qb_pre, bsk_mod.q)
    diff = sub_mod(y_bsk, aq, bsk_mod.q)
    return mul_mod_shoup(diff, mtib, mtib_pre, bsk_mod.q)


@lru_cache(maxsize=None)
def _behz_floor_tables(q_moduli: tuple, bsk_moduli: tuple):
    Q = 1
    for q in q_moduli:
        Q *= q
    k = len(bsk_moduli)
    qinv_b = _const_table([[pow(Q % b, -1, b)] for b in bsk_moduli],
                          (k, 1), [[b] for b in bsk_moduli])
    bsk_mod = make_mod_consts(bsk_moduli, trailing_dims=1)
    return qinv_b, bsk_mod


def rns_floor_q(tx_q: U64, tx_bsk: U64, q_moduli: tuple,
                bsk_moduli: tuple) -> U64:
    """floor(tx / Q) over Bsk, up to an additive alpha < L error
    (reference: FastRNSFloorq): (tx_bsk - FastBConv(tx_q, Q->Bsk)) / Q."""
    q_moduli, bsk_moduli = tuple(q_moduli), tuple(bsk_moduli)
    (qinv, qinv_pre), bsk_mod = _behz_floor_tables(q_moduli, bsk_moduli)
    conv = approx_switch_basis(tx_q, q_moduli, bsk_moduli)
    diff = sub_mod(tx_bsk, conv, bsk_mod.q)
    return mul_mod_shoup(diff, qinv, qinv_pre, bsk_mod.q)


@lru_cache(maxsize=None)
def _behz_sk_tables(b_moduli: tuple, m_sk: int, q_moduli: tuple):
    Bprod = 1
    for b in b_moduli:
        Bprod *= b
    binv_msk = pow(Bprod % m_sk, -1, m_sk)
    bi, bi_pre = _const_table([[binv_msk]], (1, 1), [[m_sk]])
    L = len(q_moduli)
    b_q = _const_table([[Bprod % q] for q in q_moduli], (L, 1),
                       [[q] for q in q_moduli])
    q_mod = make_mod_consts(q_moduli, trailing_dims=1)
    msk_mod = make_mod_consts((m_sk,), trailing_dims=1)
    half = (m_sk - 1) // 2
    return (bi, bi_pre), b_q, q_mod, msk_mod, half


def base_conv_sk(y_bsk: U64, b_moduli: tuple, m_sk: int,
                 q_moduli: tuple) -> U64:
    """Exact Shenoy-Kumaresan conversion Bsk = B + {m_sk} -> Q (reference:
    FastBaseConvSK, dcrtpoly-impl.h:2309): the extra residue mod m_sk
    pins the FastBConv overflow alpha (centered, so slightly negative
    values are handled)."""
    b_moduli, q_moduli = tuple(b_moduli), tuple(q_moduli)
    kb = len(b_moduli)
    y_b = U64(y_bsk.lo[:kb], y_bsk.hi[:kb])
    y_msk = U64(y_bsk.lo[kb:], y_bsk.hi[kb:])       # [1, n]
    (bi, bi_pre), (bq, bq_pre), q_mod, msk_mod, half = _behz_sk_tables(
        b_moduli, m_sk, q_moduli)
    # alpha = (FastBConv(y_B, B->m_sk) - y_msk) * B^{-1} mod m_sk, centered
    conv_msk = approx_switch_basis(y_b, b_moduli, (m_sk,))
    d = sub_mod(conv_msk, y_msk, msk_mod.q)
    alpha = mul_mod_shoup(d, bi, bi_pre, msk_mod.q)  # [1, n] in [0, m_sk)
    # centered correction: alpha > m_sk/2 means negative
    conv_q = approx_switch_basis(y_b, b_moduli, q_moduli)
    a_b = U64(jnp.broadcast_to(alpha.lo, conv_q.lo.shape),
              jnp.broadcast_to(alpha.hi, conv_q.hi.shape))
    aB = mul_mod_shoup(a_b, bq, bq_pre, q_mod.q)     # alpha * B mod q_i
    pos = sub_mod(conv_q, aB, q_mod.q)               # alpha as-is
    # for the centered branch: alpha - m_sk (negative) ->
    # out = conv - (alpha - m_sk) * B = pos + m_sk * B
    mskB = _const_table(
        [[(m_sk * _prod(b_moduli)) % q] for q in q_moduli],
        (len(q_moduli), 1), None)[0]
    neg = add_mod(pos, mskB, q_mod.q)
    is_neg = alpha.lo > jnp.uint32(half) if m_sk < (1 << 32) else None
    if is_neg is None:
        a_val = alpha  # need 64-bit compare
        is_neg = (a_val.hi > jnp.uint32(half >> 32)) | (
            (a_val.hi == jnp.uint32(half >> 32))
            & (a_val.lo > jnp.uint32(half & 0xFFFFFFFF)))
    mask = jnp.broadcast_to(is_neg, pos.lo.shape)
    return U64(jnp.where(mask, neg.lo, pos.lo),
               jnp.where(mask, neg.hi, pos.hi))


def _prod(vals):
    out = 1
    for v in vals:
        out *= v
    return out
