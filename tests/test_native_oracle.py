"""Native C++ oracle vs the JAX kernels at LARGE sizes (n=2^14) — the
cross-validation the pure-Python oracle is too slow for."""

import numpy as np
import pytest

from openfhe_tpu import native
from openfhe_tpu.ops import limb, ntt, rns
from openfhe_tpu.utils import nbtheory

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")

rng = np.random.default_rng(77)


def test_mod_ops_match_python():
    q = nbtheory.first_prime(60, 1 << 14)
    a = rng.integers(0, q, size=1000, dtype=np.uint64)
    b = rng.integers(0, q, size=1000, dtype=np.uint64)
    assert all(int(v) == (int(x) + int(y)) % q
               for v, x, y in zip(native.mod_add(a, b, q), a, b))
    assert all(int(v) == int(x) * int(y) % q
               for v, x, y in zip(native.mod_mul(a, b, q), a, b))


def test_ntt_large_bit_exact():
    """JAX NTT == native NTT at n=2^14, 60-bit modulus, elementwise."""
    n = 1 << 14
    q = nbtheory.generate_prime_chain(1, 60, n)[0]
    psi = nbtheory.root_of_unity(2 * n, q)
    oracle = native.NttOracle(n, q, psi)
    vals = rng.integers(0, q, size=n, dtype=np.uint64)
    expected = oracle.forward(vals)

    plan = ntt.make_plan(n, (q,))
    a = limb.U64((vals & 0xFFFFFFFF).astype(np.uint32)[None, :],
                 (vals >> 32).astype(np.uint32)[None, :])
    got = ntt.forward_jit(plan, a)
    got_vals = (np.asarray(got.hi[0], dtype=np.uint64) << 32) | \
        np.asarray(got.lo[0], dtype=np.uint64)
    assert np.array_equal(got_vals, expected)

    back = oracle.inverse(expected)
    assert np.array_equal(back, vals)
    got_back = ntt.inverse_jit(plan, got)
    back_vals = (np.asarray(got_back.hi[0], dtype=np.uint64) << 32) | \
        np.asarray(got_back.lo[0], dtype=np.uint64)
    assert np.array_equal(back_vals, vals)


def test_approx_switch_large_bit_exact():
    n = 1 << 12
    Qm = tuple(nbtheory.generate_prime_chain(4, 55, n))
    Pm = tuple(nbtheory.generate_prime_chain(2, 58, n, list(Qm)))
    x = np.stack([rng.integers(0, q, size=n, dtype=np.uint64) for q in Qm])
    expected = native.approx_switch(x, Qm, Pm)

    import jax
    xu = limb.U64((x & 0xFFFFFFFF).astype(np.uint32),
                  (x >> 32).astype(np.uint32))
    got = jax.jit(lambda a: rns.approx_switch_basis(a, Qm, Pm))(xu)
    got_vals = (np.asarray(got.hi, dtype=np.uint64) << 32) | \
        np.asarray(got.lo, dtype=np.uint64)
    assert np.array_equal(got_vals, expected)
