"""MXU (systolic-array) formulation of ApproxSwitchCRTBasis — experiment.

The basis-conversion MAC y[j, c] = sum_i xhat[i, c] * T[j, i] mod p_j is
a [K, L] x [L, n] integer matrix product followed by a per-row modular
reduction. The VPU path (ops/rns.py) pays ~6 native multiplies per term;
this module instead routes the bulk MACs through the MXU:

  * xhat (u32, < 2^31) is split into FIVE 7-bit digit planes X_a [L, n]
    (7-bit so the values stay non-negative in SIGNED int8, the MXU's
    native integer operand type); the constant table into five planes
    C_b [K, L].
  * P_w = sum_{a+b=w} C_b @ X_a for w = 0..8 — 25 int8 x int8 -> int32
    matmuls on the MXU. Each entry is bounded by
    (#pairs <= 5) * L * 127^2 < 2^31 for L <= 26000, so int32 is exact.
  * y = sum_w P_w * 2^(7w) mod p_j — NINE Shoup constant-multiplies on
    the VPU (2^(7w) reduced mod p_j host-side) instead of L.

VPU work drops from L to 9 constant-multiplies per output row; the
matmuls are negligible MXU time at these shapes. Worthwhile iff L > ~10
and the int8 digit extraction (3 shifts + masks + casts) stays fused.

Bit-exactness: every step is an exact integer identity; verified against
rns.approx_switch_basis in tests/test_rns_mxu.py. Measured TPU numbers
live in NTT_PERF.md (the experiment ships regardless of outcome, like
ops/ntt_pallas.py).

Reference semantics: DCRTPolyImpl::ApproxSwitchCRTBasis
(``dcrtpoly-impl.h:1034-1061``).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

import jax  # noqa: F401  (jnp.matmul path only)

from .limb import U64
from .modular import (
    add_mod32,
    is_u32_moduli,
    make_mod_consts32,
    mul_mod_shoup32,
    shoup_precon32_int,
)


@lru_cache(maxsize=None)
def _mxu_tables(from_moduli: tuple, to_moduli: tuple):
    """int8 digit planes of the QHat table + per-weight 2^(7w) Shoup
    constants + the step-1 QHatInv Shoup tables (shared with rns.py)."""
    from .rns import switch_basis_tables

    (qhi, qhi_pre), (qh_p, _), _ = switch_basis_tables(from_moduli,
                                                       to_moduli)
    L, K = len(from_moduli), len(to_moduli)
    # qh_p.lo is [K, L, 1] uint32 (host numpy)
    tab = np.asarray(qh_p.lo).reshape(K, L).astype(np.uint64)
    c_planes = np.stack([((tab >> (7 * b)) & 0x7F).astype(np.int8)
                         for b in range(5)])          # [5, K, L]
    pw = []
    pw_pre = []
    for j, p in enumerate(to_moduli):
        pw.append([(1 << (7 * w)) % p for w in range(9)])
        pw_pre.append([shoup_precon32_int(v, p) for v in pw[-1]])
    pw = np.asarray(pw, np.uint32).T.reshape(9, K, 1)       # [9, K, 1]
    pw_pre = np.asarray(pw_pre, np.uint32).T.reshape(9, K, 1)
    q32f = make_mod_consts32(from_moduli).q
    q32t = make_mod_consts32(to_moduli).q
    return (np.asarray(qhi.lo), np.asarray(qhi_pre.hi), q32f,
            c_planes, pw, pw_pre, q32t)


def approx_switch_basis_mxu(x: U64, from_moduli: tuple,
                            to_moduli: tuple) -> U64:
    """MXU-routed ApproxSwitchCRTBasis for all-u32 bases; bit-exact vs
    rns.approx_switch_basis."""
    from_moduli, to_moduli = tuple(from_moduli), tuple(to_moduli)
    assert is_u32_moduli(from_moduli) and is_u32_moduli(to_moduli)
    assert len(from_moduli) <= 26000, "int32 accumulator bound"
    qhi, qhi_pre32, q32f, c_planes, pw, pw_pre, q32t = _mxu_tables(
        from_moduli, to_moduli)
    # step 1 (VPU): xhat_i = [x_i * QHatInv_i]_{q_i}
    xhat = mul_mod_shoup32(x.lo, qhi, qhi_pre32, q32f)      # [L, n] u32
    # step 2 (MXU): weighted digit matmuls
    x_planes = [((xhat >> (7 * a)) & jnp.uint32(0x7F)).astype(jnp.int8)
                for a in range(5)]                          # 5 x [L, n]
    partials = [None] * 9                                   # [K, n] int32
    for a in range(5):
        for b in range(5):
            p = jnp.matmul(jnp.asarray(c_planes[b]), x_planes[a],
                           preferred_element_type=jnp.int32)
            w = a + b
            partials[w] = p if partials[w] is None else partials[w] + p
    # step 3 (VPU): y = sum_w P_w * 2^(7w) mod p_j
    acc = None
    for w in range(9):
        pu = partials[w].astype(jnp.uint32)
        term = mul_mod_shoup32(pu, pw[w], pw_pre[w], q32t)
        acc = term if acc is None else add_mod32(acc, term, q32t)
    return U64(acc, jnp.zeros_like(acc))
