"""Distributed (four-step) negacyclic NTT over a coefficient-sharded mesh.

The reference's only parallelism for the NTT is OpenMP across towers — the
fork's DPU NTT kernel was never implemented and DPUs cannot talk to each
other (SURVEY §2.7/§5: "host is the interconnect"). Here the coefficient
axis itself is sharded: with n = n1*n2,

  1. column NTTs of size n1 (local — each device holds whole columns),
  2. an exact elementwise twist (precomputed [n1, n2] constants),
  3. a global transpose (the ONE collective: XLA lowers the resharding to
     an all-to-all across the mesh's coeff axis — this is the ICI hop),
  4. row NTTs of size n2 (local again).

Derivation: with e = e1 + 2*n1*u (odd exponents mod 2n), the inner sum over
j1 is itself a size-n1 negacyclic NTT (root psi^n2); the outer sum over j2
becomes a size-n2 negacyclic NTT (root psi^n1) after twisting by
psi^(e1(c1)*j2) * psi2^(-j2), using the identity cyclic_DFT(v)[rev(c)] =
negacyclic(v * psi2^(-j)).

Order contract: output slot (c1, c2) holds the transform value with exponent
e1(c1) + 2*n1*rev_n2(c2) = 2*rev_n(c1*n2 + c2) + 1, i.e. row-major four-step
output **is exactly** ``ntt.forward``'s bit-reversed order (the low/high bit
blocks of rev_n factor as rev_n1/rev_n2; verified by ``output_perm`` being
the identity and by the bit-equality tests). ``four_step_forward`` /
``four_step_inverse`` are therefore drop-in replacements for
``ntt.forward`` / ``ntt.inverse``, bit-exact with the same Shoup/limb
kernels, just re-blocked around one all-to-all.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ntt
from ..ops.limb import U64, from_int_array
from ..ops.modular import mul_mod_shoup, shoup_precon_int
from ..utils import nbtheory


def split_factors(n: int) -> tuple:
    """Balanced power-of-two split n = n1*n2 with n1 >= n2."""
    bits = n.bit_length() - 1
    b2 = bits // 2
    return 1 << (bits - b2), 1 << b2


@lru_cache(maxsize=None)
def twist_values(n1: int, n2: int, moduli: tuple):
    """Exact twist constants for the four-step factorization, as nested int
    lists laid out [L][n1][n2] (row c1, column j2):

        T[c1][j2] = psi^(e1(c1)*j2) * psi2^(-j2),   psi2 = psi^n1,

    with e1(c1) = 2*rev_n1(c1) + 1 (the order contract of the size-n1
    stage NTT, exponents of psi1 = psi^n2). Returns (twist, twist_precon,
    inv_twist, inv_twist_precon); shared by the distributed path here and
    the single-chip blocked path in ops/ntt.py."""
    n = n1 * n2
    rev1 = ntt.bit_reverse_perm(n1)
    twists, pres = [], []
    inv_twists, inv_pres = [], []
    for q in moduli:
        psi = nbtheory.root_of_unity(2 * n, q)
        rows, prow, irows, iprow = [], [], [], []
        for c1 in range(n1):
            e1 = 2 * int(rev1[c1]) + 1
            base, pbase, ibase, ipbase = [], [], [], []
            step = pow(psi, (e1 - n1) % (2 * n), q)
            istep = pow(step, -1, q)
            v, vi = 1, 1
            for j2 in range(n2):
                base.append(v)
                pbase.append(shoup_precon_int(v, q))
                ibase.append(vi)
                ipbase.append(shoup_precon_int(vi, q))
                v = v * step % q
                vi = vi * istep % q
            rows.append(base)
            prow.append(pbase)
            irows.append(ibase)
            iprow.append(ipbase)
        twists.append(rows)
        pres.append(prow)
        inv_twists.append(irows)
        inv_pres.append(iprow)
    return twists, pres, inv_twists, inv_pres


@lru_cache(maxsize=None)
def _four_step_tables(n1: int, n2: int, moduli: tuple):
    """Size-n1/n2 plans + twist constants (and inverses), laid out
    [n2, L, n1] to match the step-1/2 pipeline blocking."""
    plan1 = ntt.make_plan(n1, moduli)
    plan2 = ntt.make_plan(n2, moduli)
    twists, pres, inv_twists, inv_pres = twist_values(n1, n2, moduli)

    def pack(vals):  # [L, n1, n2] -> [n2, L, n1]
        t = from_int_array(np.asarray(vals, dtype=object))
        return U64(np.ascontiguousarray(t.lo.transpose(2, 0, 1)),
                   np.ascontiguousarray(t.hi.transpose(2, 0, 1)))

    return (plan1, plan2, pack(twists), pack(pres),
            pack(inv_twists), pack(inv_pres))


@lru_cache(maxsize=None)
def output_perm(n1: int, n2: int) -> np.ndarray:
    """Mapping from ntt.forward slot order to four-step row-major (c1, c2)
    order. This is the IDENTITY (see module docstring); kept as an
    executable proof used by the tests."""
    n = n1 * n2
    rev1 = ntt.bit_reverse_perm(n1)
    rev2 = ntt.bit_reverse_perm(n2)
    rev_n = ntt.bit_reverse_perm(n)
    # slot (c1, c2) holds exponent e1(c1) + 2*n1*rev2(c2)
    exp_to_pos = {}
    for c1 in range(n1):
        e1 = 2 * int(rev1[c1]) + 1
        for c2 in range(n2):
            e = (e1 + 2 * n1 * int(rev2[c2])) % (2 * n)
            exp_to_pos[e] = c1 * n2 + c2
    perm = np.zeros(n, dtype=np.int64)
    for j in range(n):
        e_j = 2 * int(rev_n[j]) + 1
        perm[j] = exp_to_pos[e_j]
    return perm


def _constrain(arr, mesh, spec):
    if mesh is None:
        return arr
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.lax.with_sharding_constraint(arr, NamedSharding(mesh, P(*spec)))


def _constrain64(x: U64, mesh, spec) -> U64:
    return U64(_constrain(x.lo, mesh, spec), _constrain(x.hi, mesh, spec))


def _spec(ndim, first):
    """PartitionSpec tuple: `first` on axis 0, "tower" on axis -2, rest
    unsharded — the second-to-last axis is always the tower axis here."""
    spec = [None] * ndim
    spec[0] = first
    spec[-2] = "tower"
    return tuple(spec)


def _expand(t, extra):
    """Twist table [n2, L, n1] -> [n2, 1…1, L, n1] for batch broadcasting."""
    if extra == 0:
        return t
    shape = (t.lo.shape[0],) + (1,) * extra + t.lo.shape[1:]
    return U64(t.lo.reshape(shape), t.hi.reshape(shape))


def four_step_forward(x: U64, n1: int, n2: int, moduli: tuple,
                      mesh=None) -> U64:
    """x: [..., L, n] natural-order coefficients -> same shape, evaluations
    in ``ntt.forward``'s slot order (bit-exact). If a mesh is given,
    sharding constraints pin steps 1/4 local and force the all-to-all at
    the transpose."""
    plan1, plan2, tw, twp, _, _ = _four_step_tables(n1, n2, tuple(moduli))
    lead = x.lo.shape[:-1]          # (..., L)
    extra = len(lead) - 1

    # [..., L, n1, n2] -> [n2, ..., L, n1]: whole columns local (j2 shard)
    def blocks(a):
        return jnp.moveaxis(a.reshape(lead + (n1, n2)), -1, 0)

    g = U64(blocks(x.lo), blocks(x.hi))
    g = _constrain64(g, mesh, _spec(g.lo.ndim, "coeff"))
    g = ntt.forward(plan1, g)                       # local size-n1 NTTs
    g = mul_mod_shoup(g, _expand(tw, extra), _expand(twp, extra),
                      plan1.mod.q)
    # global transpose [n2, ..., L, n1] -> [n1, ..., L, n2]: the all-to-all
    h = U64(jnp.swapaxes(g.lo, 0, -1), jnp.swapaxes(g.hi, 0, -1))
    h = _constrain64(h, mesh, _spec(h.lo.ndim, "coeff"))
    h = ntt.forward(plan2, h)                       # local size-n2 NTTs

    # [n1, ..., L, c2] -> [..., L, n1*n2] row-major == standard slot order
    def out(a):
        return jnp.moveaxis(a, 0, -2).reshape(lead + (n1 * n2,))

    return _constrain_poly(U64(out(h.lo), out(h.hi)), mesh)


def _constrain_poly(x: U64, mesh) -> U64:
    """[..., L, n] with tower on -2, coeff on -1."""
    if mesh is None:
        return x
    spec = [None] * x.lo.ndim
    spec[-2] = "tower"
    spec[-1] = "coeff"
    return _constrain64(x, mesh, tuple(spec))


def four_step_inverse(y: U64, n1: int, n2: int, moduli: tuple,
                      mesh=None) -> U64:
    """Exact inverse of four_step_forward (== ntt.inverse bit-exactly):
    undo row NTTs, untwist, global transpose, undo column NTTs. The 1/n
    scaling comes out of the two stage inverses (1/n2 * 1/n1)."""
    plan1, plan2, _, _, itw, itwp = _four_step_tables(n1, n2, tuple(moduli))
    lead = y.lo.shape[:-1]
    extra = len(lead) - 1

    # [..., L, n1, n2] -> [n1, ..., L, n2]: rows local (c1 shard)
    def blocks(a):
        return jnp.moveaxis(a.reshape(lead + (n1, n2)), -2, 0)

    h = U64(blocks(y.lo), blocks(y.hi))
    h = _constrain64(h, mesh, _spec(h.lo.ndim, "coeff"))
    h = ntt.inverse(plan2, h)                       # local size-n2 iNTTs
    # global transpose [n1, ..., L, n2] -> [n2, ..., L, n1]: the all-to-all
    g = U64(jnp.swapaxes(h.lo, 0, -1), jnp.swapaxes(h.hi, 0, -1))
    g = _constrain64(g, mesh, _spec(g.lo.ndim, "coeff"))
    g = mul_mod_shoup(g, _expand(itw, extra), _expand(itwp, extra),
                      plan1.mod.q)                   # undo the twist
    g = ntt.inverse(plan1, g)                       # local size-n1 iNTTs

    # [n2, ..., L, j1] -> [..., L, n1, n2] -> [..., L, n]
    def out(a):
        return jnp.moveaxis(a, 0, -1).reshape(lead + (n1 * n2,))

    o = U64(out(g.lo), out(g.hi))
    return _constrain_poly(o, mesh)


def standard_order(result: U64, n1: int, n2: int) -> U64:
    """Identity passthrough kept for API compatibility: four-step row-major
    output already matches ntt.forward's slot order (output_perm proof)."""
    assert np.array_equal(output_perm(n1, n2), np.arange(n1 * n2))
    return result
