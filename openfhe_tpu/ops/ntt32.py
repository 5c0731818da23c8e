"""Single-limb u32 negacyclic NTT engine for tower moduli q < 2^31.

The u64 engine (ops/ntt.py) emulates every 64-bit Shoup modmul with ~28
16-bit half-product multiplies in 32-bit lanes — unavoidable for 60-bit
moduli, but pure waste when the modulus fits 31 bits (2q < 2^32): there one
native u32 multiply gives the exact low half and one 4-multiply tree the
high half, so a Shoup modmul costs 6 multiplies. This module is that fast
path: same transform, same slot-order contract, same four-step blocked
schedule as ``ntt.blocked_forward``, operating on plain uint32 arrays
(the ``lo`` plane of the U64 pytrees). ``ntt.forward/inverse`` dispatch
here automatically when every modulus in the plan is below 2^31.

This is the TPU-native analog of the reference's NATIVE_INT=32 build
(``math/hal/intnat/ubintnat.h`` with 32-bit NativeInteger): on hardware
whose vector word is 32 bits, sub-2^31 moduli are the speed-of-light
representation, and CKKS reaches big scaling factors through composite
scaling (two ~30-bit towers per rescale) rather than 60-bit words.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils import nbtheory
from .limb import U32
from .modular import add_mod32, mul_mod_shoup32, shoup_precon32_int, sub_mod32


class Plan32(NamedTuple):
    """Host-resident uint32 tables for a chain of L sub-2^31 moduli at ring
    dimension n. Twiddles are [L, n] in bit-reversed order; scalars [L, 1].
    """

    n: int
    moduli: tuple
    q: np.ndarray             # [L, 1]
    psi_br: np.ndarray        # [L, n]
    psi_br_pre: np.ndarray    # 32-bit Shoup precons
    psi_inv_br: np.ndarray
    psi_inv_br_pre: np.ndarray
    n_inv: np.ndarray         # [L, 1]
    n_inv_pre: np.ndarray


def _u32(vals, shape):
    return np.asarray(vals, dtype=np.uint32).reshape(shape)


@lru_cache(maxsize=None)
def make_plan32(n: int, moduli: tuple) -> Plan32:
    from .ntt import bit_reverse_perm

    moduli = tuple(int(q) for q in moduli)
    assert all(q < (1 << 31) for q in moduli), "u32 path needs q < 2^31"
    rev = bit_reverse_perm(n)
    L = len(moduli)
    psi_rows, pre_rows, inv_rows, inv_pre_rows = [], [], [], []
    ninv_rows, ninv_pre_rows = [], []
    for q in moduli:
        psi = nbtheory.root_of_unity(2 * n, q)
        pw = [1] * n
        for j in range(1, n):
            pw[j] = pw[j - 1] * psi % q
        psi_inv = nbtheory.mod_inverse(psi, q)
        pwi = [1] * n
        for j in range(1, n):
            pwi[j] = pwi[j - 1] * psi_inv % q
        br = [pw[rev[j]] for j in range(n)]
        bri = [pwi[rev[j]] for j in range(n)]
        psi_rows.append(br)
        pre_rows.append([shoup_precon32_int(v, q) for v in br])
        inv_rows.append(bri)
        inv_pre_rows.append([shoup_precon32_int(v, q) for v in bri])
        ninv = nbtheory.mod_inverse(n, q)
        ninv_rows.append([ninv])
        ninv_pre_rows.append([shoup_precon32_int(ninv, q)])
    return Plan32(
        n, moduli,
        _u32([[q] for q in moduli], (L, 1)),
        _u32(psi_rows, (L, n)), _u32(pre_rows, (L, n)),
        _u32(inv_rows, (L, n)), _u32(inv_pre_rows, (L, n)),
        _u32(ninv_rows, (L, 1)), _u32(ninv_pre_rows, (L, 1)),
    )


# ---------------------------------------------------------------------------
# Flat pipeline (butterflies on the last axis) — small n
# ---------------------------------------------------------------------------


def _flat(plan: Plan32, x, fwd: bool):
    n = plan.n
    lead = x.shape[:-1]
    q = plan.q[..., None]        # [L, 1, 1] vs [..., L, m, t]
    if fwd:
        m = 1
        while m < n:
            t = n // (2 * m)
            v4 = x.reshape(lead + (m, 2, t))
            u, v = v4[..., 0, :], v4[..., 1, :]
            w = plan.psi_br[:, m:2 * m, None]
            wp = plan.psi_br_pre[:, m:2 * m, None]
            vw = mul_mod_shoup32(v, w, wp, q)
            x = jnp.stack([add_mod32(u, vw, q), sub_mod32(u, vw, q)],
                          axis=-2).reshape(lead + (n,))
            m *= 2
        return x
    t, m = 1, n
    while m > 1:
        h = m // 2
        v4 = x.reshape(lead + (h, 2, t))
        u, v = v4[..., 0, :], v4[..., 1, :]
        top = add_mod32(u, v, q)
        diff = sub_mod32(u, v, q)
        w = plan.psi_inv_br[:, h:2 * h, None]
        wp = plan.psi_inv_br_pre[:, h:2 * h, None]
        x = jnp.stack([top, mul_mod_shoup32(diff, w, wp, q)],
                      axis=-2).reshape(lead + (n,))
        t *= 2
        m = h
    return mul_mod_shoup32(x, plan.n_inv, plan.n_inv_pre, plan.q)


# ---------------------------------------------------------------------------
# Blocked four-step (butterflies on axis -2, lanes pinned at n2/n1)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _blocked_tables32(n1: int, n2: int, moduli: tuple):
    from ..parallel import dntt

    plan1 = make_plan32(n1, moduli)
    plan2 = make_plan32(n2, moduli)
    tw, _, itw, _ = dntt.twist_values(n1, n2, moduli)
    L = len(moduli)

    def pack(vals):
        return _u32([[[int(v) for v in row] for row in tower]
                     for tower in vals], (L, n1, n2))

    def pre(vals):
        return _u32([[[shoup_precon32_int(int(v), q) for v in row]
                      for row in tower]
                     for q, tower in zip(moduli, vals)], (L, n1, n2))

    return plan1, plan2, pack(tw), pre(tw), pack(itw), pre(itw)


def _stages2(plan: Plan32, x, fwd: bool):
    """Butterfly stages over axis -2 of [..., L, R, C]."""
    R = plan.n
    lead = x.shape[:-2]
    C = x.shape[-1]
    q = plan.q[..., None, None]   # [L, 1, 1, 1]
    if fwd:
        m = 1
        while m < R:
            t = R // (2 * m)
            v5 = x.reshape(lead + (m, 2, t, C))
            u, v = v5[..., 0, :, :], v5[..., 1, :, :]
            w = plan.psi_br[:, m:2 * m, None, None]
            wp = plan.psi_br_pre[:, m:2 * m, None, None]
            vw = mul_mod_shoup32(v, w, wp, q)
            x = jnp.stack([add_mod32(u, vw, q), sub_mod32(u, vw, q)],
                          axis=-3).reshape(lead + (R, C))
            m *= 2
        return x
    t, m = 1, R
    while m > 1:
        h = m // 2
        v5 = x.reshape(lead + (h, 2, t, C))
        u, v = v5[..., 0, :, :], v5[..., 1, :, :]
        top = add_mod32(u, v, q)
        diff = sub_mod32(u, v, q)
        w = plan.psi_inv_br[:, h:2 * h, None, None]
        wp = plan.psi_inv_br_pre[:, h:2 * h, None, None]
        x = jnp.stack([top, mul_mod_shoup32(diff, w, wp, q)],
                      axis=-3).reshape(lead + (R, C))
        t *= 2
        m = h
    return mul_mod_shoup32(x, plan.n_inv[..., None], plan.n_inv_pre[..., None],
                           plan.q[..., None])


def blocked_forward(plan: Plan32, a):
    from ..parallel import dntt

    n1, n2 = dntt.split_factors(plan.n)
    p1, p2, tw, twp, _, _ = _blocked_tables32(n1, n2, plan.moduli)
    lead = a.shape[:-1]
    x = a.reshape(lead + (n1, n2))
    x = _stages2(p1, x, True)
    x = mul_mod_shoup32(x, tw, twp, plan.q[..., None])
    x = jnp.swapaxes(x, -1, -2)
    x = _stages2(p2, x, True)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(lead + (plan.n,))


def blocked_inverse(plan: Plan32, a):
    from ..parallel import dntt

    n1, n2 = dntt.split_factors(plan.n)
    p1, p2, _, _, itw, itwp = _blocked_tables32(n1, n2, plan.moduli)
    lead = a.shape[:-1]
    x = a.reshape(lead + (n1, n2))
    x = jnp.swapaxes(x, -1, -2)
    x = _stages2(p2, x, False)
    x = jnp.swapaxes(x, -1, -2)
    x = mul_mod_shoup32(x, itw, itwp, plan.q[..., None])
    x = _stages2(p1, x, False)
    return x.reshape(lead + (plan.n,))


def forward(plan: Plan32, a):
    """u32 [..., L, n] natural order -> ntt.forward slot order."""
    from .ntt import FOUR_STEP_MIN_N

    a = jnp.asarray(a, U32)
    if plan.n >= FOUR_STEP_MIN_N and a.ndim >= 2:
        return blocked_forward(plan, a)
    return _flat(plan, a, True)


def inverse(plan: Plan32, a):
    """u32 slot order -> natural coefficients, 1/n folded in."""
    from .ntt import FOUR_STEP_MIN_N

    a = jnp.asarray(a, U32)
    if plan.n >= FOUR_STEP_MIN_N and a.ndim >= 2:
        return blocked_inverse(plan, a)
    return _flat(plan, a, False)
