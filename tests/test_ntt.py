"""NTT correctness: roundtrip identity, negacyclic convolution theorem vs an
exact schoolbook oracle, and the evaluation-order contract that automorphism
maps rely on. Mirrors the reference's UnitTestNTT/UnitTestTransform strategy
(switch format twice -> identity; transform vs naive).
"""

import jax
import numpy as np
import pytest

from openfhe_tpu.ops import limb, modular, ntt
from openfhe_tpu.utils import nbtheory

rng = np.random.default_rng(42)


def jit_fwd(plan):
    return jax.jit(lambda a: ntt.forward(plan, a))


def jit_inv(plan):
    return jax.jit(lambda a: ntt.inverse(plan, a))


def random_poly(n, moduli):
    rows = [[int(v) for v in rng.integers(0, q, size=n, dtype=np.uint64)]
            for q in moduli]
    return limb.from_int_array(rows), rows


def to_rows(x, L):
    arr = limb.to_int_array(x)
    return [list(arr[i]) for i in range(L)]


@pytest.mark.parametrize("n", [16, 256, 2048])
@pytest.mark.parametrize("bits", [30, 59, 60])
def test_roundtrip(n, bits):
    moduli = nbtheory.generate_prime_chain(3, bits, n)
    plan = ntt.make_plan(n, moduli)
    a, rows = random_poly(n, moduli)
    back = jit_inv(plan)(jit_fwd(plan)(a))
    assert to_rows(back, 3) == rows


@pytest.mark.parametrize("n", [16, 128])
def test_negacyclic_convolution(n):
    moduli = nbtheory.generate_prime_chain(2, 58, n)
    plan = ntt.make_plan(n, moduli)
    a, arows = random_poly(n, moduli)
    b, brows = random_poly(n, moduli)
    fwd = jit_fwd(plan)
    fa = fwd(a)
    fb = fwd(b)
    prod = modular.mul_mod(fa, fb, plan.mod)
    got = to_rows(jit_inv(plan)(prod), 2)
    # exact negacyclic schoolbook: c_k = sum_{i+j=k} a_i b_j - sum_{i+j=k+n}
    for t, q in enumerate(moduli):
        c = [0] * n
        for i in range(n):
            for j in range(n):
                k = i + j
                term = arows[t][i] * brows[t][j]
                if k < n:
                    c[k] = (c[k] + term) % q
                else:
                    c[k - n] = (c[k - n] - term) % q
        assert got[t] == c


@pytest.mark.parametrize("n", [8, 32])
def test_evaluation_order_contract(n):
    """forward(a)[j] must equal p(psi^(2*bitrev(j)+1)) mod q."""
    q = nbtheory.generate_prime_chain(1, 40, n)[0]
    plan = ntt.make_plan(n, [q])
    a, rows = random_poly(n, [q])
    out = to_rows(jit_fwd(plan)(a), 1)[0]
    psi = nbtheory.root_of_unity(2 * n, q)
    rev = ntt.bit_reverse_perm(n)
    coeffs = rows[0]
    for j in range(n):
        e = 2 * int(rev[j]) + 1
        point = pow(psi, e, q)
        val = 0
        for i in reversed(range(n)):
            val = (val * point + coeffs[i]) % q
        assert out[j] == val, f"slot {j}"
