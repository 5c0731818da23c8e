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
negacyclic(v * psi2^(-j)). Output slot (c1, c2) therefore holds the
standard transform's slot with exponent e1(c1) + 2*n1*rev_n2(c2); the
``output_perm`` table maps four-step order back to ``ntt.forward`` order for
bit-exact interop.

Everything is bit-exact: the same Shoup/limb kernels, just re-blocked.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ntt
from ..ops.limb import U64, from_int_array
from ..ops.modular import mul_mod_shoup, shoup_precon_int
from ..utils import nbtheory


@lru_cache(maxsize=None)
def _four_step_tables(n1: int, n2: int, moduli: tuple):
    """Twist constants [L, n1, n2] (laid out for the [n2, L, n1] pipeline as
    [n2, L, n1]... stored [L, n1, n2] and transposed at build) + plans."""
    n = n1 * n2
    plan1 = ntt.make_plan(n1, moduli)
    plan2 = ntt.make_plan(n2, moduli)
    rev1 = ntt.bit_reverse_perm(n1)
    twists = []
    pres = []
    for q in moduli:
        psi = nbtheory.root_of_unity(2 * n, q)
        # e1(c1) = 2*rev_n1(c1) + 1  (order contract of the size-n1 NTT,
        # exponents of psi1 = psi^n2)
        rows = []
        prow = []
        for c1 in range(n1):
            e1 = (2 * int(rev1[c1]) + 1)
            base = []
            pbase = []
            for j2 in range(n2):
                # psi^(e1*j2) * psi2^(-j2), psi2 = psi^n1
                expo = (e1 * j2 - n1 * j2) % (2 * n)
                v = pow(psi, expo, q)
                base.append(v)
                pbase.append(shoup_precon_int(v, q))
            rows.append(base)
            prow.append(pbase)
        twists.append(rows)
        pres.append(prow)
    tw = from_int_array(np.asarray(twists, dtype=object))   # [L, n1, n2]
    twp = from_int_array(np.asarray(pres, dtype=object))
    return plan1, plan2, tw, twp


@lru_cache(maxsize=None)
def output_perm(n1: int, n2: int) -> np.ndarray:
    """perm with standard_forward(x)[j] == four_step(x).reshape(L, n)[
    :, perm[j]] where four-step output is laid out [c1, c2] row-major."""
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


def four_step_forward(x: U64, n1: int, n2: int, moduli: tuple,
                      mesh=None) -> U64:
    """x: [L, n] natural-order coefficients -> [L, n] four-step-order
    evaluations. If a mesh is given, sharding constraints pin step 1/4 to
    be local and force the all-to-all at the transpose."""
    plan1, plan2, tw, twp = _four_step_tables(n1, n2, tuple(moduli))
    L = x.lo.shape[0]

    def maybe_constrain(arr, spec):
        if mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.lax.with_sharding_constraint(
            arr, NamedSharding(mesh, P(*spec)))

    # [L, n1, n2] -> [n2, L, n1]: each device holds whole columns (j2 shard)
    g = U64(x.lo.reshape(L, n1, n2).transpose(2, 0, 1),
            x.hi.reshape(L, n1, n2).transpose(2, 0, 1))
    g = U64(maybe_constrain(g.lo, ("coeff", "tower", None)),
            maybe_constrain(g.hi, ("coeff", "tower", None)))
    g = ntt.forward(plan1, g)                       # local size-n1 NTTs
    # twist: constants laid [L, n1, n2] -> align to [n2, L, n1]
    tw_t = U64(tw.lo.transpose(2, 0, 1), tw.hi.transpose(2, 0, 1))
    twp_t = U64(twp.lo.transpose(2, 0, 1), twp.hi.transpose(2, 0, 1))
    # plan1.mod.q is [L, 1]; right-aligned broadcast against [n2, L, n1]
    g = mul_mod_shoup(g, tw_t, twp_t, plan1.mod.q)
    # global transpose [n2, L, n1] -> [n1, L, n2]: the all-to-all
    h = U64(g.lo.transpose(2, 1, 0), g.hi.transpose(2, 1, 0))
    h = U64(maybe_constrain(h.lo, ("coeff", "tower", None)),
            maybe_constrain(h.hi, ("coeff", "tower", None)))
    h = ntt.forward(plan2, h)                       # local size-n2 NTTs
    # back to [L, n1*n2] row-major (c1, c2)
    out_lo = h.lo.transpose(1, 0, 2).reshape(L, n1 * n2)
    out_hi = h.hi.transpose(1, 0, 2).reshape(L, n1 * n2)
    return U64(out_lo, out_hi)


def standard_order(result: U64, n1: int, n2: int) -> U64:
    """Reorder four-step output to ntt.forward's slot order (host/global
    gather — used for verification; pipelines keep four-step order)."""
    perm = jnp.asarray(output_perm(n1, n2))
    return U64(result.lo[:, perm], result.hi[:, perm])
