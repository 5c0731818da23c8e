"""MP12 ring trapdoor + Gaussian preimage sampling (the reference's
UnitTestTrapdoor.cpp contract: TrapdoorGen/GaussSamp produce short
preimages with A.x = u)."""

import numpy as np

from openfhe_tpu import dcrt
from openfhe_tpu.dcrt import Format, RnsBasis
from openfhe_tpu.models import trapdoor as td
from openfhe_tpu.ops.limb import from_int_array
from openfhe_tpu.utils import nbtheory, sampling

RNG = np.random.default_rng(42)


def test_trapdoor_preimage():
    n = 128
    q = nbtheory.first_prime(28, 2 * n)
    base = 4
    A, T = td.trapdoor_gen(n, q, base, sigma=3.19, rng=RNG)
    assert len(A) == len(T.r) + 2

    basis = RnsBasis(n, (q,))
    u_rows = sampling.uniform_rns_rows(n, basis.moduli, RNG)
    u = dcrt.make_poly(basis, from_int_array(u_rows), Format.EVAL)

    x = td.gauss_samp(n, q, base, A, T, u, sigma=3.19, rng=RNG)
    got = dcrt.to_int_rows(dcrt.to_coeff(td.apply_A(A, x)))[0]
    want = dcrt.to_int_rows(dcrt.to_coeff(u))[0]
    assert all(int(a) == int(b) for a, b in zip(got, want))

    # shortness: preimage coefficients are exponentially below q
    mx = 0.0
    for xi in x:
        c = np.array([int(v) for v in
                      dcrt.to_int_rows(dcrt.to_coeff(xi))[0]], dtype=object)
        c = np.where(c > q // 2, c - q, c).astype(np.float64)
        mx = max(mx, float(np.abs(c).max()))
    assert mx < q / 1000.0, (mx, q)


def test_g_preimage_congruence():
    q = nbtheory.first_prime(20, 256)
    base = 4
    k = -(-q.bit_length() // 2)  # base^k > q with nonzero top digit
    v = RNG.integers(0, q, size=64)
    z = td._g_preimage(v, q, base, k, sigma=3.19, rng=RNG)
    g = np.array([pow(base, i, q) for i in range(k)], dtype=object)
    got = np.tensordot(g, z.astype(object), axes=(0, 0)) % q
    assert np.all(got == v % q)
    assert np.abs(z).max() < 10 * base
