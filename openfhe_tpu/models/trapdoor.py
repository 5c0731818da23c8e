"""Ring-LWE lattice trapdoors (Micciancio-Peikert) and Gaussian preimage
sampling.

Role of the reference's ``lattice/trapdoor.h`` / ``trapdoor-impl.h``
(``RLWETrapdoorUtility::TrapdoorGen`` / ``GaussSamp``) and the G-lattice
samplers in ``lattice/dgsampling.h`` — the machinery behind GPV
signatures, IBE/ABE and other advanced protocols built on OpenFHE.

Construction (MP12, ring version):
  TrapdoorGen: A = [1, a, g_0 - (a r_0 + e_0), ..., g_{k-1} - (a r_{k-1}
  + e_{k-1})] in R_q^{k+2} with g_i = base^i and short Gaussian (r, e).
  For any x_t in R^k:  A . (r.x_t, e.x_t, x_t) = g.x_t  (the e/r terms
  cancel), so preimages of u reduce to G-lattice preimages of
  v = u - A.p plus a perturbation p.

  GaussSamp: p <- spherical Gaussian perturbation; v = u - A.p;
  z <- randomized Babai nearest-plane on the standard triangular basis of
  the G-lattice coset {z : g.z = v mod q}; x = p + (r.z, e.z, z).

The nearest-plane randomized rounding here draws from a rounded Gaussian
per plane (the reference's exact MP perturbation sampler
``SamplePertSquareMat`` is a further variance correction; preimage
correctness A.x = u and shortness hold identically, which is what the
unit tests — mirroring UnitTestTrapdoor.cpp — verify).

Ring arithmetic rides the framework's single-tower RnsPoly path (NTT
multiplies on device), so sampling batches over all n coefficients.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from .. import dcrt
from ..dcrt import Format, RnsBasis, RnsPoly
from ..ops.limb import from_int_array
from ..utils import sampling


@dataclasses.dataclass
class TrapdoorPair:
    """The secret (r, e) short vectors (reference: RLWETrapdoorPair)."""
    r: List[RnsPoly]   # k ring elements, EVAL
    e: List[RnsPoly]


def _ring(basis: RnsBasis, coeffs: np.ndarray) -> RnsPoly:
    rows = sampling.signed_to_rns_rows(coeffs.astype(np.int64), basis.moduli)
    return dcrt.to_eval(dcrt.from_int_rows(basis, rows, Format.COEFF))


def _gauss_poly(basis: RnsBasis, n: int, sigma: float,
                rng: np.random.Generator) -> Tuple[RnsPoly, np.ndarray]:
    c = np.rint(rng.normal(0, sigma, size=n)).astype(np.int64)
    return _ring(basis, c), c


def trapdoor_gen(n: int, q: int, base: int, sigma: float,
                 rng: np.random.Generator):
    """(role of RLWETrapdoorUtility::TrapdoorGen.) Returns (A, T) with
    A a list of k+2 ring elements and T the trapdoor."""
    basis = RnsBasis(n, (q,))
    k = -(-q.bit_length() // int(np.log2(base)))
    a_rows = sampling.uniform_rns_rows(n, basis.moduli, rng)
    a = dcrt.make_poly(basis, from_int_array(a_rows), Format.EVAL)
    one = _ring(basis, np.array([1] + [0] * (n - 1)))
    rs, es, A_tail = [], [], []
    for i in range(k):
        g_i = pow(base, i, q)
        r_p, _ = _gauss_poly(basis, n, sigma, rng)
        e_p, _ = _gauss_poly(basis, n, sigma, rng)
        rs.append(r_p)
        es.append(e_p)
        g_poly = _ring(basis, np.array([g_i] + [0] * (n - 1)))
        A_tail.append(dcrt.sub(g_poly, dcrt.add(dcrt.mul(a, r_p), e_p)))
    return [one, a] + A_tail, TrapdoorPair(rs, es)


def _g_lattice_basis(q: int, base: int, k: int) -> np.ndarray:
    """Triangular basis of Lambda^perp(g) = {z : sum z_i base^i = 0 mod q}
    (columns; reference: the S matrix of dgsampling)."""
    assert base ** k > q >= base ** (k - 1), \
        "k must satisfy base^(k-1) <= q < base^k (nonzero top digit)"
    S = np.zeros((k, k), dtype=np.int64)
    for i in range(k - 1):
        S[i, i] = base
        S[i + 1, i] = -1
    # last column: the base-b digits of q
    rem = q
    for i in range(k):
        S[i, k - 1] = rem % base
        rem //= base
    return S


def _g_preimage(v: np.ndarray, q: int, base: int, k: int, sigma: float,
                rng: np.random.Generator) -> np.ndarray:
    """Sample short z [k, n] with sum_i z_i base^i = v mod q, per
    coefficient, via randomized Babai nearest-plane on the triangular
    G-lattice basis (role of LatticeGaussSampUtility::GaussSampGqArbBase).
    """
    n = v.shape[0]
    # initial (long) solution: plain digits of v
    t = np.zeros((k, n), dtype=np.int64)
    rem = v.astype(np.int64) % q
    for i in range(k):
        t[i] = rem % base
        rem //= base
    S = _g_lattice_basis(q, base, k)
    # Gram-Schmidt norms of the triangular S are ~base; randomized
    # nearest-plane from the last column back
    z = t.astype(np.float64)
    coeffs = np.zeros((k, n), dtype=np.int64)
    for j in range(k - 1, -1, -1):
        # project onto plane j: c = <z, b*_j>/<b*_j, b*_j> ~ z_j / S[j, j]
        c = z[j] / float(S[j, j])
        ci = np.rint(c + rng.normal(0, sigma / float(S[j, j]), size=n)
                     ).astype(np.int64)
        coeffs[j] = ci
        z -= S[:, j:j + 1] * ci[None, :]
    out = t - S @ coeffs
    assert np.all((np.tensordot(
        np.array([pow(base, i, q) for i in range(k)], dtype=object),
        out.astype(object), axes=(0, 0)) - v.astype(object)) % q == 0)
    return out


def gauss_samp(n: int, q: int, base: int, A: List[RnsPoly],
               T: TrapdoorPair, u: RnsPoly, sigma: float,
               rng: np.random.Generator) -> List[RnsPoly]:
    """Sample x in R^{k+2} with A.x = u (role of
    RLWETrapdoorUtility::GaussSamp)."""
    basis = RnsBasis(n, (q,))
    k = len(T.r)
    s_big = sigma * (base + 1) * np.sqrt(float(k * n))  # spectral slack
    # 1. perturbation p and v = u - A.p
    ps = []
    Ap = None
    for i in range(k + 2):
        p_i, _ = _gauss_poly(basis, n, s_big, rng)
        ps.append(p_i)
        term = dcrt.mul(A[i], p_i)
        Ap = term if Ap is None else dcrt.add(Ap, term)
    v = dcrt.sub(u, Ap)
    v_coeffs = np.array(
        [int(c) for c in dcrt.to_int_rows(dcrt.to_coeff(v))[0]],
        dtype=np.int64)
    # 2. G-lattice preimage of v
    z = _g_preimage(v_coeffs, q, base, k, sigma, rng)
    z_polys = [_ring(basis, z[i]) for i in range(k)]
    # 3. x = p + (e.z, r.z, z): the "1" slot carries e.z and the "a" slot
    # r.z so that 1*(e.z) + a*(r.z) cancels the -(a r_i + e_i) z_i terms
    rz = ez = None
    for i in range(k):
        tr = dcrt.mul(T.r[i], z_polys[i])
        te = dcrt.mul(T.e[i], z_polys[i])
        rz = tr if rz is None else dcrt.add(rz, tr)
        ez = te if ez is None else dcrt.add(ez, te)
    x = [dcrt.add(ps[0], ez), dcrt.add(ps[1], rz)]
    x += [dcrt.add(ps[2 + i], z_polys[i]) for i in range(k)]
    return x


def apply_A(A: List[RnsPoly], x: List[RnsPoly]) -> RnsPoly:
    acc = None
    for ai, xi in zip(A, x):
        term = dcrt.mul(ai, xi)
        acc = term if acc is None else dcrt.add(acc, term)
    return acc
