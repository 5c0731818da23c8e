"""Modular-arithmetic kernels vs exact Python-int oracle, across the moduli
sizes the schemes use (small NTT primes up to 60-bit OpenFHE-default primes).
"""

import numpy as np
import pytest

from openfhe_tpu.ops import limb, modular
from openfhe_tpu.ops.limb import U64
from openfhe_tpu.utils import nbtheory

rng = np.random.default_rng(777)
N = 2048

MODULI = [
    (1 << 16) + 1,                       # tiny Fermat prime
    nbtheory.first_prime(30, 1 << 12),    # 30-bit NTT prime
    nbtheory.first_prime(45, 1 << 15),    # 45-bit
    nbtheory.first_prime(59, 1 << 17),    # 59-bit
    nbtheory.first_prime(60, 1 << 17),    # 60-bit (OpenFHE MAX_MODULUS_SIZE)
]


def rand_mod(q, n=N):
    vals = rng.integers(0, q, size=n, dtype=np.uint64)
    vals[:3] = [0, 1, q - 1]
    return limb.from_int_array([int(v) for v in vals]), [int(v) for v in vals]


def rand_64(n=N):
    vals = rng.integers(0, 1 << 63, size=n, dtype=np.uint64) * 2 + \
        rng.integers(0, 2, size=n, dtype=np.uint64)
    vals[:2] = [0, (1 << 64) - 1]
    return limb.from_int_array([int(v) for v in vals]), [int(v) for v in vals]


def ints(x):
    return list(limb.to_int_array(x).ravel())


@pytest.mark.parametrize("q", MODULI)
def test_add_sub_neg(q):
    m = modular.make_mod_consts([q], trailing_dims=0)
    a, ia = rand_mod(q)
    b, ib = rand_mod(q)
    assert ints(modular.add_mod(a, b, m.q)) == [(x + y) % q for x, y in zip(ia, ib)]
    assert ints(modular.sub_mod(a, b, m.q)) == [(x - y) % q for x, y in zip(ia, ib)]
    assert ints(modular.neg_mod(a, m.q)) == [(-x) % q for x in ia]


@pytest.mark.parametrize("q", MODULI)
def test_barrett_word_any_input(q):
    m = modular.make_mod_consts([q], trailing_dims=0)
    x, ix = rand_64()
    assert ints(modular.barrett_word(x, m.q, m.mu)) == [v % q for v in ix]


@pytest.mark.parametrize("q", MODULI)
def test_mul_mod_shoup(q):
    m = modular.make_mod_consts([q], trailing_dims=0)
    x, ix = rand_64()  # Shoup works for ANY 64-bit x
    consts = [int(v) for v in rng.integers(0, q, size=8, dtype=np.uint64)]
    consts[0] = q - 1
    for c in consts:
        cc = limb.from_int(c)
        pre = limb.from_int(modular.shoup_precon_int(c, q))
        got = ints(modular.mul_mod_shoup(x, cc, pre, m.q))
        assert got == [v * c % q for v in ix]


@pytest.mark.parametrize("q", MODULI)
def test_mul_mod_general(q):
    m = modular.make_mod_consts([q], trailing_dims=0)
    x, ix = rand_64()
    y, iy = rand_64()
    assert ints(modular.mul_mod(x, y, m)) == [a * b % q for a, b in zip(ix, iy)]


@pytest.mark.parametrize("q", MODULI)
def test_div_round_word(q):
    m = modular.make_mod_consts([q], trailing_dims=0)
    x, ix = rand_64()
    quot, rem, rounded = modular.div_round_word(x, m.q, m.mu)
    assert ints(quot) == [v // q for v in ix]
    assert ints(rem) == [v % q for v in ix]
    assert ints(rounded) == [(v + q // 2 + (q & 1)) // q if False else
                             (2 * v + q) // (2 * q) for v in ix]


@pytest.mark.parametrize("q", MODULI[:3])
def test_mod_exp(q):
    m = modular.make_mod_consts([q], trailing_dims=0)
    a, ia = rand_mod(q, 64)
    exps = [int(v) for v in rng.integers(0, 1 << 62, size=64, dtype=np.uint64)]
    e = limb.from_int_array(exps)
    assert ints(modular.mod_exp(a, e, m)) == [pow(x, k, q) for x, k in zip(ia, exps)]


def test_switch_modulus():
    q_old = MODULI[3]
    for q_new in [MODULI[4], MODULI[2], MODULI[1]]:
        m_old = modular.make_mod_consts([q_old], trailing_dims=0)
        m_new = modular.make_mod_consts([q_new], trailing_dims=0)
        a, ia = rand_mod(q_old)
        got = ints(modular.switch_modulus(a, m_old, m_new))
        expected = []
        for v in ia:
            centered = v - q_old if v > q_old // 2 else v
            expected.append(centered % q_new)
        assert got == expected


def test_mod_by_two():
    a, ia = rand_64()
    assert ints(modular.mod_by_two(a)) == [v & 1 for v in ia]
