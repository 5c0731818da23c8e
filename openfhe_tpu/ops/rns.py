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
from .limb import U64, from_int_array
from .modular import (
    add_mod,
    make_mod_consts,
    mul_mod_shoup,
    shoup_precon_int,
    sub_mod,
    switch_modulus,
)


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
    (qhi, qhi_pre), (qh_p, qh_p_pre), to_mod = switch_basis_tables(
        tuple(from_moduli), tuple(to_moduli))
    from_mod = make_mod_consts(tuple(from_moduli), trailing_dims=1)
    # step 1: y_i = [x_i * QHatInv_i]_{q_i}   [L, n]
    y = mul_mod_shoup(x, qhi, qhi_pre, from_mod.q)
    # step 2: terms_{j,i} = y_i * [QHat_i]_{p_j} mod p_j, summed over i.
    # Loop towers in Python (L small) to keep the working set at [K, n].
    L = len(from_moduli)
    K = len(to_moduli)
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
    x_rest = U64(x.lo[: L - 1], x.hi[: L - 1])
    x_last = U64(x.lo[L - 1][None, :], x.hi[L - 1][None, :])
    last_plan = _ntt.make_plan(x.lo.shape[-1], (moduli[-1],))
    x_last_coeff = _ntt.inverse(last_plan, x_last)
    s = switch_modulus(x_last_coeff, old_mod, new_mod)  # [L-1, n] coeff
    rest_plan = _ntt.make_plan(x.lo.shape[-1], moduli[:-1])
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
    x_rest = U64(x.lo[: L - 1], x.hi[: L - 1])
    x_last = U64(x.lo[L - 1][None, :], x.hi[L - 1][None, :])
    # centered switch of the last tower into each remaining modulus
    s = switch_modulus(x_last, old_mod, new_mod)  # [L-1, n]
    diff = sub_mod(x_rest, s, new_mod.q)
    return mul_mod_shoup(diff, inv, inv_pre, new_mod.q)
