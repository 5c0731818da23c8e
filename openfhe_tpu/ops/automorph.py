"""Galois automorphisms x -> x^k on ring elements, in both representations.

In EVALUATION form the automorphism is a pure permutation of slots (a gather
with a host-precomputed index map), because slot j holds the value at
psi^(2*bitrev(j)+1) (the order contract of ``ntt.forward``) and sigma_k sends
the evaluation point with odd exponent e to the point with exponent k*e mod 2n.

In COEFFICIENT form, x^i -> x^(k*i mod 2n) with sign flip when k*i lands in
[n, 2n) (negacyclic wraparound).

Role of the reference's ``DCRTPolyImpl::AutomorphismTransform``
(``lattice/hal/default/dcrtpoly-impl.h:350``) / ``PolyImpl`` (:312), rebuilt
as precomputed-gather tables (TPU: one gather, no per-element index math).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .limb import U64
from .ntt import bit_reverse_perm


@lru_cache(maxsize=None)
def eval_perm(n: int, k: int) -> np.ndarray:
    """Index map P with out[j] = in[P[j]] for sigma_k in EVALUATION form."""
    assert k % 2 == 1, "automorphism index must be odd"
    rev = bit_reverse_perm(n)
    # slot j holds exponent e(j) = 2*rev(j)+1; exponent -> slot inverse map
    exp_to_slot = np.zeros(2 * n, dtype=np.int64)
    for j in range(n):
        exp_to_slot[(2 * int(rev[j]) + 1)] = j
    perm = np.zeros(n, dtype=np.int64)
    for j in range(n):
        e = (2 * int(rev[j]) + 1) * k % (2 * n)
        perm[j] = exp_to_slot[e]
    return perm


@lru_cache(maxsize=None)
def coeff_maps(n: int, k: int):
    """(dest_index, sign_flip) arrays for sigma_k in COEFFICIENT form:
    coefficient i is sent to position k*i mod n with sign (-1)^floor(k*i/n).
    Returned as a gather map: out[j] = +/- in[src[j]].
    """
    assert k % 2 == 1
    src = np.zeros(n, dtype=np.int64)
    flip = np.zeros(n, dtype=bool)
    for i in range(n):
        e = k * i % (2 * n)
        if e < n:
            src[e] = i
            flip[e] = False
        else:
            src[e - n] = i
            flip[e - n] = True
    return src, flip


def apply_eval(x: U64, n: int, k: int) -> U64:
    """Automorphism in EVALUATION form: slot permutation along last axis."""
    perm = jnp.asarray(eval_perm(n, k))
    return U64(x.lo[..., perm], x.hi[..., perm])


def apply_eval_array(x, n: int, k: int):
    """Single-plane variant (u32 fast path: the hi plane is identically
    zero, so gathering it would be pure wasted HBM traffic)."""
    perm = jnp.asarray(eval_perm(n, k))
    return x[..., perm]


def apply_coeff(x: U64, q: U64, n: int, k: int) -> U64:
    """Automorphism in COEFFICIENT form: gather + negacyclic sign flip."""
    from .modular import neg_mod

    src, flip = coeff_maps(n, k)
    src = jnp.asarray(src)
    flip_j = jnp.asarray(flip)
    gathered = U64(x.lo[..., src], x.hi[..., src])
    negged = neg_mod(gathered, q)
    lo = jnp.where(flip_j, negged.lo, gathered.lo)
    hi = jnp.where(flip_j, negged.hi, gathered.hi)
    return U64(lo, hi)
