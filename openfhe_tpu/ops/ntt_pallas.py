"""Fused four-step negacyclic NTT as a single Pallas TPU kernel.

The XLA stage pipeline (ops/ntt.py) round-trips HBM between stages; even
the four-step re-blocking (parallel/dntt.py) pays ~4 full HBM passes. This
kernel keeps one tower's [n1, n2] block resident in VMEM for ALL log2(n)
butterfly stages, the twist, and both transposes — one HBM read and one
HBM write per tower (the blueprint's hard parts #1/#6, SURVEY §7; the op
the reference fork's DPU kernel ``src/core/pim/dpu/ntt/ntt.c`` left as a
printf stub, done as the real device kernel).

Layout: a tower is viewed as [n1 rows, n2 lanes]. Butterfly stages run on
the SUBLANE axis (rows) so the lane dimension stays n2 >= 128 in every
stage. Mosaic dislikes rank-changing reshapes, so stages are expressed
RANK-2 only: each stage multiplies the whole block by a per-row twiddle
table, exchanges butterfly partners with two sublane rolls, and selects
add/sub rows with a per-stage row mask —

  CT stage (m groups, half-size t):     new[r] = r in "u" rows
      ? x[r] + (w x)[r+t]   : x[r-t] - (w x)[r]
  GS stage:                             new[r] = r in "u" rows
      ? x[r] + x[r+t]       : w (x[r-t] - x[r])

All tables ([R, S] per-stage row twiddles + masks) are host-precomputed;
the arithmetic is the same Shoup/limb code from ops.modular/ops.limb
(pure jnp, traces into Mosaic unchanged), so results are bit-exact vs
ntt.forward/inverse and the C++ oracle.

Inverse: Gentleman-Sande stages with BOTH 1/n1 and 1/n2 scalings folded
into the untwist table (scaling commutes with the linear stages), so the
inverse kernel needs no extra scalar passes.

Grid: one program per tower; per-tower modulus scalars ride SMEM.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import nbtheory
from .limb import U64
from .modular import add_mod, mul_mod_shoup, shoup_precon_int, sub_mod

_MASK32 = 0xFFFFFFFF


def _split_u64(arr_int):
    a = np.asarray(arr_int, dtype=object)
    flat = [int(v) for v in a.ravel()]
    lo = np.asarray([v & _MASK32 for v in flat], np.uint32).reshape(a.shape)
    hi = np.asarray([v >> 32 for v in flat], np.uint32).reshape(a.shape)
    return lo, hi


def _stage_geometry(R: int, forward: bool):
    """(t, base_index) per stage: CT runs m=1..R/2 (t=R/(2m)); GS runs
    h=R/2..1 (t=1 doubling). base_index is the twiddle-table offset block
    (psi[base + r // (2t)])."""
    out = []
    if forward:
        m = 1
        while m < R:
            out.append((R // (2 * m), m))
            m *= 2
    else:
        t, m = 1, R
        while m > 1:
            h = m // 2
            out.append((t, h))
            t *= 2
            m = h
    return out


@lru_cache(maxsize=None)
def _row_tables(R: int, moduli: tuple, forward: bool):
    """Per-stage per-row twiddles [L, R, S] (value + Shoup precon, split
    into uint32 limb planes) + the shared u-row masks [1, R, S]."""
    S = R.bit_length() - 1
    geo = _stage_geometry(R, forward)
    rev = np.zeros(R, dtype=np.int64)
    bits = S
    idx = np.arange(R)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)

    w_all, wp_all = [], []
    for q in moduli:
        psi = nbtheory.root_of_unity(2 * R, q)
        root = psi if forward else pow(psi, -1, q)
        pw = [1] * R
        for j in range(1, R):
            pw[j] = pw[j - 1] * root % q
        br = [pw[rev[j]] for j in range(R)]
        wt = np.zeros((R, S), dtype=object)
        wpt = np.zeros((R, S), dtype=object)
        for s, (t, base) in enumerate(geo):
            for r in range(R):
                c = br[base + r // (2 * t)]
                wt[r, s] = c
                wpt[r, s] = shoup_precon_int(c, q)
        w_all.append(wt)
        wp_all.append(wpt)
    w_lo, w_hi = _split_u64(np.stack(w_all))
    wp_lo, wp_hi = _split_u64(np.stack(wp_all))
    masks = np.zeros((1, R, S), np.uint32)
    for s, (t, _) in enumerate(geo):
        masks[0, :, s] = (((np.arange(R) // t) % 2) == 0).astype(np.uint32)
    return (w_lo, w_hi, wp_lo, wp_hi, masks)


@lru_cache(maxsize=None)
def _twist_tables(n1: int, n2: int, moduli: tuple):
    """Forward twist [L, n1, n2] (row-major [c1, j2]) and inverse untwist
    with 1/n folded, each as (lo, hi, pre_lo, pre_hi)."""
    n = n1 * n2
    rev1 = np.zeros(n1, dtype=np.int64)
    bits = n1.bit_length() - 1
    idx = np.arange(n1)
    for b in range(bits):
        rev1 |= ((idx >> b) & 1) << (bits - 1 - b)
    tw, twp, itw, itwp = [], [], [], []
    for q in moduli:
        psi = nbtheory.root_of_unity(2 * n, q)
        ninv = pow(n, -1, q)
        t_m = np.zeros((n1, n2), dtype=object)
        tp_m = np.zeros((n1, n2), dtype=object)
        it_m = np.zeros((n1, n2), dtype=object)
        itp_m = np.zeros((n1, n2), dtype=object)
        for c1 in range(n1):
            e1 = 2 * int(rev1[c1]) + 1
            step = pow(psi, (e1 - n1) % (2 * n), q)
            v = 1
            for j2 in range(n2):
                vi = pow(v, -1, q) * ninv % q
                t_m[c1, j2] = v
                tp_m[c1, j2] = shoup_precon_int(v, q)
                it_m[c1, j2] = vi
                itp_m[c1, j2] = shoup_precon_int(vi, q)
                v = v * step % q
        tw.append(t_m)
        twp.append(tp_m)
        itw.append(it_m)
        itwp.append(itp_m)
    f = _split_u64(np.stack(tw)) + _split_u64(np.stack(twp))
    i = _split_u64(np.stack(itw)) + _split_u64(np.stack(itwp))
    return f, i


def _roll(a, shift: int, R: int, interpret: bool):
    """Sublane roll by a static shift (output[r] = a[(r - shift) mod R])."""
    shift = shift % R
    if interpret:
        return jnp.roll(a, shift, axis=0)
    return pltpu.roll(a, shift, 0)


def _col_stages(x: U64, wl, wh, wpl, wph, mask_ref, q: U64, R: int,
                forward: bool, interpret: bool) -> U64:
    """Run all log2(R) butterfly stages over axis 0 of [R, C], rank-2."""
    geo = _stage_geometry(R, forward)
    for s, (t, _) in enumerate(geo):
        w = U64(wl[0, :, s:s + 1], wh[0, :, s:s + 1])          # [R, 1]
        wp = U64(wpl[0, :, s:s + 1], wph[0, :, s:s + 1])
        is_u = mask_ref[0, :, s:s + 1] != 0                    # [R, 1]

        def dn(v):  # dn[r] = v[r + t]
            return _roll(v, -t, R, interpret)

        def up(v):  # up[r] = v[r - t]
            return _roll(v, t, R, interpret)

        if forward:
            p = mul_mod_shoup(x, w, wp, q)                     # w*x all rows
            p_dn = U64(dn(p.lo), dn(p.hi))
            x_up = U64(up(x.lo), up(x.hi))
            top = add_mod(x, p_dn, q)                          # u rows
            bot = sub_mod(x_up, p, q)                          # v rows
        else:
            x_dn = U64(dn(x.lo), dn(x.hi))
            x_up = U64(up(x.lo), up(x.hi))
            top = add_mod(x, x_dn, q)                          # u rows
            diff = sub_mod(x_up, x, q)                         # v rows
            bot = mul_mod_shoup(diff, w, wp, q)
        x = U64(jnp.where(is_u, top.lo, bot.lo),
                jnp.where(is_u, top.hi, bot.hi))
    return x


def _fwd_kernel(n1, n2, interpret):
    def kernel(xl, xh, w1l, w1h, p1l, p1h, m1, w2l, w2h, p2l, p2h, m2,
               twl, twh, tpl, tph, ql, qh, ol, oh):
        q = U64(ql[0, 0, 0], qh[0, 0, 0])
        x = U64(xl[0], xh[0])                          # [n1(j1), n2(j2)]
        x = _col_stages(x, w1l, w1h, p1l, p1h, m1, q, n1, True, interpret)
        x = mul_mod_shoup(x, U64(twl[0], twh[0]), U64(tpl[0], tph[0]), q)
        x = U64(x.lo.T, x.hi.T)                        # [j2, c1]
        x = _col_stages(x, w2l, w2h, p2l, p2h, m2, q, n2, True, interpret)
        ol[0] = x.lo.T                                 # [c1, c2] row-major
        oh[0] = x.hi.T

    return kernel


def _inv_kernel(n1, n2, interpret):
    def kernel(xl, xh, w1l, w1h, p1l, p1h, m1, w2l, w2h, p2l, p2h, m2,
               twl, twh, tpl, tph, ql, qh, ol, oh):
        q = U64(ql[0, 0, 0], qh[0, 0, 0])
        y = U64(xl[0], xh[0])                          # [c1, c2]
        y = U64(y.lo.T, y.hi.T)                        # [c2, c1]
        y = _col_stages(y, w2l, w2h, p2l, p2h, m2, q, n2, False, interpret)
        y = U64(y.lo.T, y.hi.T)                        # [c1, j2]
        y = mul_mod_shoup(y, U64(twl[0], twh[0]), U64(tpl[0], tph[0]), q)
        y = _col_stages(y, w1l, w1h, p1l, p1h, m1, q, n1, False, interpret)
        ol[0] = y.lo
        oh[0] = y.hi

    return kernel


@lru_cache(maxsize=None)
def _build(n1: int, n2: int, moduli: tuple, forward: bool, interpret: bool):
    n = n1 * n2
    L = len(moduli)
    w1l, w1h, wp1l, wp1h, m1 = _row_tables(n1, moduli, forward)
    w2l, w2h, wp2l, wp2h, m2 = _row_tables(n2, moduli, forward)
    ftw, itw = _twist_tables(n1, n2, moduli)
    twist = ftw if forward else itw
    kern = (_fwd_kernel(n1, n2, interpret) if forward
            else _inv_kernel(n1, n2, interpret))

    def spec3(d1, d2, tower_indexed=True):
        if tower_indexed:
            return pl.BlockSpec((1, d1, d2), lambda i: (i, 0, 0))
        return pl.BlockSpec((1, d1, d2), lambda i: (0, 0, 0))

    smem = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                        memory_space=pltpu.SMEM)
    s1 = n1.bit_length() - 1
    s2 = n2.bit_length() - 1

    call = pl.pallas_call(
        kern,
        grid=(L,),
        in_specs=[
            spec3(n1, n2), spec3(n1, n2),              # x lo/hi
            spec3(n1, s1), spec3(n1, s1),              # stage twiddles R=n1
            spec3(n1, s1), spec3(n1, s1),              # precons R=n1
            spec3(n1, s1, False),                       # masks R=n1 (shared)
            spec3(n2, s2), spec3(n2, s2),              # stage twiddles R=n2
            spec3(n2, s2), spec3(n2, s2),              # precons R=n2
            spec3(n2, s2, False),                       # masks R=n2 (shared)
            spec3(n1, n2), spec3(n1, n2),              # twist
            spec3(n1, n2), spec3(n1, n2),              # twist precon
            smem, smem,                                 # q
        ],
        out_specs=[spec3(n1, n2), spec3(n1, n2)],
        out_shape=[jax.ShapeDtypeStruct((L, n1, n2), jnp.uint32),
                   jax.ShapeDtypeStruct((L, n1, n2), jnp.uint32)],
        interpret=interpret,
    )

    q_lo, q_hi = _split_u64([[ [q] ] for q in moduli])
    tabs = (w1l, w1h, wp1l, wp1h, m1, w2l, w2h, wp2l, wp2h, m2,
            twist[0], twist[1], twist[2], twist[3],
            q_lo.reshape(L, 1, 1), q_hi.reshape(L, 1, 1))

    def run(x: U64) -> U64:
        xl = x.lo.reshape(L, n1, n2)
        xh = x.hi.reshape(L, n1, n2)
        ol, oh = call(xl, xh, *tabs)
        return U64(ol.reshape(L, n), oh.reshape(L, n))

    return run


def forward(x: U64, moduli, n1: int | None = None, n2: int | None = None,
            interpret: bool = False) -> U64:
    """Fused-VMEM forward NTT of [L, n] (same contract as ntt.forward)."""
    from ..parallel import dntt

    n = x.lo.shape[-1]
    if n1 is None:
        n1, n2 = dntt.split_factors(n)
    return _build(n1, n2, tuple(int(q) for q in moduli), True, interpret)(x)


def inverse(x: U64, moduli, n1: int | None = None, n2: int | None = None,
            interpret: bool = False) -> U64:
    """Fused-VMEM inverse NTT of [L, n] (same contract as ntt.inverse)."""
    from ..parallel import dntt

    n = x.lo.shape[-1]
    if n1 is None:
        n1, n2 = dntt.split_factors(n)
    return _build(n1, n2, tuple(int(q) for q in moduli), False, interpret)(x)
