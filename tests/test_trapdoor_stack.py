"""The full MP12 trapdoor stack: Field2n arithmetic, Matrix/Strassen, the
exact perturbation sampler, and the discrete G-lattice sampler.

Mirrors the reference's UnitTestField2n.cpp / UnitTestMatrix.cpp /
UnitTestTrapdoor.cpp contracts (exact preimage identity + shortness).
"""

import numpy as np

from openfhe_tpu import dcrt
from openfhe_tpu.dcrt import RnsBasis
from openfhe_tpu.models import trapdoor as td
from openfhe_tpu.utils import nbtheory
from openfhe_tpu.utils.field2n import COEFF, Field2n
from openfhe_tpu.utils.matrix import Matrix

RNG = np.random.default_rng(99)


def test_field2n_roundtrip_and_ops():
    n = 16
    a = Field2n(RNG.normal(size=n).astype(np.complex128), COEFF)
    b = Field2n(RNG.normal(size=n).astype(np.complex128), COEFF)
    # format round-trip
    back = a.to_eval().to_coeff()
    assert np.max(np.abs(back.data - a.data)) < 1e-9
    # multiplication == negacyclic convolution
    prod = (a.to_eval() * b.to_eval()).to_coeff().data.real
    want = np.zeros(n)
    for i in range(n):
        for j in range(n):
            k = i + j
            v = a.data[i].real * b.data[j].real
            if k >= n:
                want[k - n] -= v
            else:
                want[k] += v
    assert np.max(np.abs(prod - want)) < 1e-7
    # inverse
    one = (a.to_eval() * a.inverse()).to_coeff().data
    assert abs(one[0] - 1) < 1e-9 and np.max(np.abs(one[1:])) < 1e-9
    # transpose: x(1/X); in EVAL it is conjugation
    t1 = a.transpose().to_eval().data
    t2 = a.to_eval().transpose().data
    assert np.max(np.abs(t1 - t2)) < 1e-8
    # even/odd split: f(x) = f0(x^2) + x f1(x^2)
    f0, f1 = a.extract_even(), a.extract_odd()
    recomb = np.zeros(n, dtype=np.complex128)
    recomb[0::2] = f0.data
    recomb[1::2] = f1.data
    assert np.allclose(recomb, a.data)


def test_matrix_strassen():
    A = Matrix(None, 0, 0, data=RNG.integers(-50, 50, (8, 8)).astype(object))
    B = Matrix(None, 0, 0, data=RNG.integers(-50, 50, (8, 8)).astype(object))
    got = A.mult(B, strassen_cutoff=2)
    want = A.data @ B.data
    assert np.all(got.data == want)
    # block ops
    top = A.extract_rows(0, 3)
    bot = A.extract_rows(4, 7)
    assert top.vstack(bot) == A
    assert A.transpose().transpose() == A


def test_gauss_samp_gq_identity_and_shortness():
    n, base = 64, 2
    q = nbtheory.first_prime(20, 2 * n)
    k = q.bit_length()
    v = RNG.integers(0, q, size=n, dtype=np.int64)
    stddev = (base + 1) * td.SIGMA
    z = td.gauss_samp_gq(v, stddev, k, q, base, RNG)
    recon = np.zeros(n, dtype=object)
    for i in range(k):
        recon = (recon + pow(base, i, q) * z[i].astype(object)) % q
    assert np.all(recon == v.astype(object) % q)
    # shortness: entries a few stddevs of the target width
    assert np.max(np.abs(z)) < 20 * stddev


def test_exact_preimage_sampling():
    """gauss_samp_exact: A.x == u exactly, x short (UnitTestTrapdoor
    contract with the reference's spectral parameterization)."""
    n, base = 32, 2
    q = nbtheory.first_prime(24, 2 * n)
    A, T = td.trapdoor_gen(n, q, base, td.SIGMA, RNG)
    k = len(T.r)
    basis = RnsBasis(n, (q,))
    from openfhe_tpu.ops.limb import from_int_array
    from openfhe_tpu.utils import sampling
    u_rows = sampling.uniform_rns_rows(n, basis.moduli, RNG)
    u = dcrt.make_poly(basis, from_int_array(u_rows), dcrt.Format.EVAL)

    x = td.gauss_samp_exact(n, q, base, A, T, u, RNG)
    got = td.apply_A(A, x)
    gr = dcrt.to_int_rows(dcrt.to_coeff(got))[0]
    ur = dcrt.to_int_rows(dcrt.to_coeff(u))[0]
    assert [int(a) for a in gr] == [int(b) for b in ur]

    # shortness: every coordinate within ~6 spectral bounds
    s = td.spectral_bound(n, k, base)
    worst = 0.0
    for xi in x:
        c = td._poly_to_reals(xi, q)
        worst = max(worst, float(np.max(np.abs(c))))
    assert worst < 6 * s, (worst, s)


def test_perturbation_covariance_sane():
    """The exact perturbation's empirical stddev is ~s (not the naive
    spherical slack): coordinates stay within a few s."""
    n, base = 32, 2
    q = nbtheory.first_prime(24, 2 * n)
    A, T = td.trapdoor_gen(n, q, base, td.SIGMA, RNG)
    k = len(T.r)
    s = td.spectral_bound(n, k, base)
    c_param = (base + 1) * td.SIGMA
    ps = td.zsample_sigma_p(n, q, s, c_param, T, RNG)
    assert len(ps) == k + 2
    vals = np.concatenate([td._poly_to_reals(p, q) for p in ps])
    assert np.max(np.abs(vals)) < 8 * s
    assert 0.05 * s < np.std(vals) < 2 * s
