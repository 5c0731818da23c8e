"""Negacyclic NTT / inverse NTT over RNS tower moduli.

The forward transform is a Cooley-Tukey decimation-in-time network (natural
input order, bit-reversed output) with the 2n-th root powers merged into the
twiddles, so no separate pre-multiplication by psi^i is needed; the inverse is
the matching Gentleman-Sande network. This is the same mathematical transform
as the reference's ``ChineseRemainderTransformFTT``
(``math/hal/intnat/transformnat-impl.h:197-552``) — the operation the fork's
DPU NTT kernel (``src/core/pim/dpu/ntt/ntt.c``) left unimplemented — but
realized as a fully vectorized, branch-free XLA program: each butterfly stage
is one reshape + one Shoup constant-multiply + modular add/sub over the whole
[L, n] tower batch, so the VPU sees wide contiguous lanes and XLA fuses the
stage pipeline.

Tables are precomputed host-side with exact Python ints (the analog of the
reference's lazy PreCompute root-table maps, ``transformnat-impl.h:708-763``)
and live as device constants captured by jit.

Evaluation-order contract (verified by tests against direct evaluation):
output slot j of the forward transform holds p(psi^(2*bitrev(j)+1)), i.e.
bit-reversed order over odd powers of psi. Automorphism index maps in
``automorph.py`` are derived from this contract.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import nbtheory
from .limb import U64
from .modular import (
    ModConsts,
    add_mod,
    make_mod_consts,
    mul_mod_shoup,
    shoup_precon_int,
    sub_mod,
)


def bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def _pack_table(values_per_tower, shape):
    """list-of-list of ints -> U64 with given shape (host-resident)."""
    flat = [v for tower in values_per_tower for v in tower]
    lo = np.asarray([v & 0xFFFFFFFF for v in flat], np.uint32).reshape(shape)
    hi = np.asarray([(v >> 32) & 0xFFFFFFFF for v in flat], np.uint32).reshape(shape)
    return U64(lo, hi)


class NTTPlan(NamedTuple):
    """Precomputed tables for batched NTT over a chain of L moduli at ring
    dimension n. All tables are [L, n] (bit-reversed psi powers) or [L, 1].
    """

    n: int
    moduli: tuple
    mod: ModConsts            # shaped [L, 1]
    psi_br: U64               # [L, n] psi^bitrev(j)
    psi_br_pre: U64           # Shoup precons
    psi_inv_br: U64           # [L, n] psi^-bitrev(j)
    psi_inv_br_pre: U64
    n_inv: U64                # [L, 1]
    n_inv_pre: U64


@lru_cache(maxsize=None)
def _plan_tables(n: int, moduli: tuple):
    rev = bit_reverse_perm(n)
    psi_rows, psi_pre_rows = [], []
    inv_rows, inv_pre_rows = [], []
    ninv_rows, ninv_pre_rows = [], []
    for q in moduli:
        psi = nbtheory.root_of_unity(2 * n, q)
        # powers psi^0..psi^(n-1) by cumulative product (exact ints)
        pw = [1] * n
        for j in range(1, n):
            pw[j] = pw[j - 1] * psi % q
        psi_inv = nbtheory.mod_inverse(psi, q)
        pwi = [1] * n
        for j in range(1, n):
            pwi[j] = pwi[j - 1] * psi_inv % q
        psi_br = [pw[rev[j]] for j in range(n)]
        psi_inv_br = [pwi[rev[j]] for j in range(n)]
        psi_rows.append(psi_br)
        psi_pre_rows.append([shoup_precon_int(v, q) for v in psi_br])
        inv_rows.append(psi_inv_br)
        inv_pre_rows.append([shoup_precon_int(v, q) for v in psi_inv_br])
        ninv = nbtheory.mod_inverse(n, q)
        ninv_rows.append([ninv])
        ninv_pre_rows.append([shoup_precon_int(ninv, q)])
    L = len(moduli)
    return (
        _pack_table(psi_rows, (L, n)),
        _pack_table(psi_pre_rows, (L, n)),
        _pack_table(inv_rows, (L, n)),
        _pack_table(inv_pre_rows, (L, n)),
        _pack_table(ninv_rows, (L, 1)),
        _pack_table(ninv_pre_rows, (L, 1)),
    )


def make_plan(n: int, moduli: Sequence[int]) -> NTTPlan:
    moduli = tuple(int(q) for q in moduli)
    assert n & (n - 1) == 0, "ring dimension must be a power of two"
    for q in moduli:
        assert (q - 1) % (2 * n) == 0, f"{q} is not NTT-friendly for 2n={2*n}"
    tables = _plan_tables(n, moduli)
    mod = make_mod_consts(moduli, trailing_dims=1)
    return NTTPlan(n, moduli, mod, *tables)


def _slice_tw(table: U64, lo_idx: int, hi_idx: int) -> U64:
    return U64(table.lo[:, lo_idx:hi_idx, None], table.hi[:, lo_idx:hi_idx, None])


# Above this ring dimension the single-chip transform runs as a four-step
# (n1 x n2 blocked) NTT: every butterfly stage runs on the second-to-last
# axis with the lane (minor) dimension pinned at n2/n1 >= 128, avoiding the
# tail stages of the flat pipeline whose lane dim shrinks to 1 and forces
# pathological relayouts. Forward and inverse are schedule-symmetric
# (2 axis swaps + 2 stage pipelines + 1 elementwise twist each). Bit-exact
# with the flat path and the distributed dntt path (same slot-order
# contract, parallel/dntt.py docstring); measurements in NTT_PERF.md.
FOUR_STEP_MIN_N = 8192


@lru_cache(maxsize=None)
def _blocked_tables(n1: int, n2: int, moduli: tuple):
    """Stage plans + twist tables packed [L, n1, n2] for the single-chip
    blocked four-step (twist values shared with parallel/dntt.py)."""
    from ..parallel import dntt

    plan1 = make_plan(n1, moduli)
    plan2 = make_plan(n2, moduli)
    tw, twp, itw, itwp = dntt.twist_values(n1, n2, moduli)

    def pack(vals):  # exact ints [L][n1][n2] -> U64 [L, n1, n2]
        from .limb import from_int_array
        return from_int_array(np.asarray(vals, dtype=object))

    return plan1, plan2, pack(tw), pack(twp), pack(itw), pack(itwp)


def _stages_axis2(plan: NTTPlan, x: U64, fwd: bool) -> U64:
    """All butterfly stages of the size-R transform over axis -2 of
    [..., L, R, C]; the lane axis C rides along untouched. Twiddle tables
    broadcast as [L, m, 1, 1] against [..., L, m, t, C]."""
    R = plan.n
    lo, hi = x.lo, x.hi
    lead = lo.shape[:-2]            # (..., L)
    C = lo.shape[-1]
    qb = U64(plan.mod.q.lo[..., None, None], plan.mod.q.hi[..., None, None])

    def tw4(table, a, b):
        return U64(table.lo[:, a:b, None, None], table.hi[:, a:b, None, None])

    if fwd:
        m = 1
        while m < R:
            t = R // (2 * m)
            xl = lo.reshape(lead + (m, 2, t, C))
            xh = hi.reshape(lead + (m, 2, t, C))
            u = U64(xl[..., 0, :, :], xh[..., 0, :, :])
            v = U64(xl[..., 1, :, :], xh[..., 1, :, :])
            w = tw4(plan.psi_br, m, 2 * m)
            wp = tw4(plan.psi_br_pre, m, 2 * m)
            vw = mul_mod_shoup(v, w, wp, qb)
            top = add_mod(u, vw, qb)
            bot = sub_mod(u, vw, qb)
            lo = jnp.stack([top.lo, bot.lo], axis=-3).reshape(lead + (R, C))
            hi = jnp.stack([top.hi, bot.hi], axis=-3).reshape(lead + (R, C))
            m *= 2
        return U64(lo, hi)
    t = 1
    m = R
    while m > 1:
        h = m // 2
        xl = lo.reshape(lead + (h, 2, t, C))
        xh = hi.reshape(lead + (h, 2, t, C))
        u = U64(xl[..., 0, :, :], xh[..., 0, :, :])
        v = U64(xl[..., 1, :, :], xh[..., 1, :, :])
        top = add_mod(u, v, qb)
        diff = sub_mod(u, v, qb)
        w = tw4(plan.psi_inv_br, h, 2 * h)
        wp = tw4(plan.psi_inv_br_pre, h, 2 * h)
        bot = mul_mod_shoup(diff, w, wp, qb)
        lo = jnp.stack([top.lo, bot.lo], axis=-3).reshape(lead + (R, C))
        hi = jnp.stack([top.hi, bot.hi], axis=-3).reshape(lead + (R, C))
        t *= 2
        m = h
    ninv = U64(plan.n_inv.lo[..., None], plan.n_inv.hi[..., None])
    ninv_p = U64(plan.n_inv_pre.lo[..., None], plan.n_inv_pre.hi[..., None])
    q3 = U64(plan.mod.q.lo[..., None], plan.mod.q.hi[..., None])
    return mul_mod_shoup(U64(lo, hi), ninv, ninv_p, q3)


def _swap_minor(x: U64) -> U64:
    return U64(jnp.swapaxes(x.lo, -1, -2), jnp.swapaxes(x.hi, -1, -2))


def blocked_forward(plan: NTTPlan, a: U64) -> U64:
    """Single-chip four-step forward: [..., L, n] natural order ->
    ntt.forward slot order, bit-exact, lane dim >= 128 in every stage."""
    from ..parallel import dntt

    n1, n2 = dntt.split_factors(plan.n)
    plan1, plan2, tw, twp, _, _ = _blocked_tables(n1, n2, plan.moduli)
    lead = a.lo.shape[:-1]
    x = U64(a.lo.reshape(lead + (n1, n2)), a.hi.reshape(lead + (n1, n2)))
    x = _stages_axis2(plan1, x, True)              # columns: j1 -> c1
    x = mul_mod_shoup(x, tw, twp,
                      U64(plan.mod.q.lo[..., None], plan.mod.q.hi[..., None]))
    x = _swap_minor(x)                             # [..., L, j2, c1]
    x = _stages_axis2(plan2, x, True)              # rows: j2 -> c2
    x = _swap_minor(x)                             # [..., L, c1, c2]
    return U64(x.lo.reshape(lead + (plan.n,)), x.hi.reshape(lead + (plan.n,)))


def blocked_inverse(plan: NTTPlan, a: U64) -> U64:
    """Exact inverse of blocked_forward (== ntt.inverse bit-exactly)."""
    from ..parallel import dntt

    n1, n2 = dntt.split_factors(plan.n)
    plan1, plan2, _, _, itw, itwp = _blocked_tables(n1, n2, plan.moduli)
    lead = a.lo.shape[:-1]
    x = U64(a.lo.reshape(lead + (n1, n2)), a.hi.reshape(lead + (n1, n2)))
    x = _swap_minor(x)                             # [..., L, c2, c1]
    x = _stages_axis2(plan2, x, False)             # rows back: c2 -> j2
    x = _swap_minor(x)                             # [..., L, c1, j2]
    x = mul_mod_shoup(x, itw, itwp,
                      U64(plan.mod.q.lo[..., None], plan.mod.q.hi[..., None]))
    x = _stages_axis2(plan1, x, False)             # columns back: c1 -> j1
    return U64(x.lo.reshape(lead + (plan.n,)), x.hi.reshape(lead + (plan.n,)))


def forward(plan: NTTPlan, a: U64) -> U64:
    """Batched forward negacyclic NTT: a is U64 with arrays [..., L, n] in
    natural coefficient order; output in bit-reversed evaluation order.

    Inputs must be reduced (< q, the module contract); when every modulus
    is below 2^31 the hi limb plane is therefore zero and the transform
    runs on the single-limb u32 engine (ops/ntt32.py), returning a zero
    hi plane that XLA's algebraic simplifier folds out of downstream
    arithmetic."""
    assert plan.moduli, "NTT over an empty modulus chain (no towers left)"
    if max(plan.moduli) < (1 << 31):
        from . import ntt32

        out = ntt32.forward(ntt32.make_plan32(plan.n, plan.moduli), a.lo)
        return U64(out, jnp.zeros_like(out))
    if plan.n >= FOUR_STEP_MIN_N and a.lo.ndim >= 2:
        return blocked_forward(plan, a)
    n = plan.n
    q = plan.mod.q
    lo, hi = a.lo, a.hi
    batch_shape = lo.shape[:-1]
    m = 1
    while m < n:
        t = n // (2 * m)
        x = U64(lo.reshape(batch_shape + (m, 2, t)),
                hi.reshape(batch_shape + (m, 2, t)))
        u = U64(x.lo[..., 0, :], x.hi[..., 0, :])
        v = U64(x.lo[..., 1, :], x.hi[..., 1, :])
        w = _slice_tw(plan.psi_br, m, 2 * m)
        wp = _slice_tw(plan.psi_br_pre, m, 2 * m)
        vw = mul_mod_shoup(v, w, wp, U64(q.lo[..., None], q.hi[..., None]))
        top = add_mod(u, vw, U64(q.lo[..., None], q.hi[..., None]))
        bot = sub_mod(u, vw, U64(q.lo[..., None], q.hi[..., None]))
        lo = jnp.stack([top.lo, bot.lo], axis=-2).reshape(batch_shape + (n,))
        hi = jnp.stack([top.hi, bot.hi], axis=-2).reshape(batch_shape + (n,))
        m *= 2
    return U64(lo, hi)


def inverse(plan: NTTPlan, a: U64) -> U64:
    """Batched inverse: bit-reversed evaluation order -> natural coefficients,
    including the 1/n scaling (folded in as a final Shoup multiply).
    """
    assert plan.moduli, "NTT over an empty modulus chain (no towers left)"
    if max(plan.moduli) < (1 << 31):
        from . import ntt32

        out = ntt32.inverse(ntt32.make_plan32(plan.n, plan.moduli), a.lo)
        return U64(out, jnp.zeros_like(out))
    if plan.n >= FOUR_STEP_MIN_N and a.lo.ndim >= 2:
        return blocked_inverse(plan, a)
    n = plan.n
    q = plan.mod.q
    lo, hi = a.lo, a.hi
    batch_shape = lo.shape[:-1]
    t = 1
    m = n
    while m > 1:
        h = m // 2
        x = U64(lo.reshape(batch_shape + (h, 2, t)),
                hi.reshape(batch_shape + (h, 2, t)))
        u = U64(x.lo[..., 0, :], x.hi[..., 0, :])
        v = U64(x.lo[..., 1, :], x.hi[..., 1, :])
        qb = U64(q.lo[..., None], q.hi[..., None])
        top = add_mod(u, v, qb)
        diff = sub_mod(u, v, qb)
        w = _slice_tw(plan.psi_inv_br, h, 2 * h)
        wp = _slice_tw(plan.psi_inv_br_pre, h, 2 * h)
        bot = mul_mod_shoup(diff, w, wp, qb)
        lo = jnp.stack([top.lo, bot.lo], axis=-2).reshape(batch_shape + (n,))
        hi = jnp.stack([top.hi, bot.hi], axis=-2).reshape(batch_shape + (n,))
        t *= 2
        m = h
    out = mul_mod_shoup(U64(lo, hi), plan.n_inv, plan.n_inv_pre, q)
    return out


# ---------------------------------------------------------------------------
# Jitted entry points (compiled once per (n, moduli, batch-shape))
# ---------------------------------------------------------------------------

_JIT_CACHE: dict = {}


def forward_jit(plan: NTTPlan, a: U64) -> U64:
    key = ("fwd", plan.n, plan.moduli)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = _JIT_CACHE[key] = jax.jit(lambda x, p=plan: forward(p, x))
    return fn(a)


def inverse_jit(plan: NTTPlan, a: U64) -> U64:
    key = ("inv", plan.n, plan.moduli)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = _JIT_CACHE[key] = jax.jit(lambda x, p=plan: inverse(p, x))
    return fn(a)
