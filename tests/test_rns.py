"""RNS toolkit vs exact Python-int oracle: basis switches, mod up/down,
rescale, scale-and-round (the reference's UnitTestBFVrnsCRTOperations role).
"""

import jax
import numpy as np
import pytest

from openfhe_tpu.ops import limb, rns
from openfhe_tpu.utils import nbtheory

rng = np.random.default_rng(31337)
N = 64


def chain(num, bits, n=N, avoid=()):
    return tuple(nbtheory.generate_prime_chain(num, bits, n, list(avoid)))


def rand_stack(moduli, n=N):
    rows = [[int(v) for v in rng.integers(0, q, size=n, dtype=np.uint64)]
            for q in moduli]
    return limb.from_int_array(np.asarray(rows, dtype=object)), rows


def crt(rows, moduli):
    """Exact CRT lift of each coefficient (list of Python ints in [0, Q))."""
    Q = 1
    for q in moduli:
        Q *= q
    out = []
    for k in range(len(rows[0])):
        x = 0
        for i, q in enumerate(moduli):
            qh = Q // q
            x += rows[i][k] * qh * pow(qh % q, -1, q)
        out.append(x % Q)
    return out, Q


def ints(x):
    arr = limb.to_int_array(x)
    return [[int(v) for v in row] for row in arr]


def test_approx_switch_basis_exact_semantics():
    Qm = chain(3, 50)
    Pm = chain(2, 55, avoid=Qm)
    x, rows = rand_stack(Qm)
    got = ints(jax.jit(lambda a: rns.approx_switch_basis(a, Qm, Pm))(x))
    Q = 1
    for q in Qm:
        Q *= q
    for k in range(N):
        # oracle: sum_i [x_i * QHatInv_i]_{q_i} * QHat_i  (the approx lift)
        lift = 0
        for i, q in enumerate(Qm):
            qh = Q // q
            lift += (rows[i][k] * pow(qh % q, -1, q) % q) * qh
        for j, p in enumerate(Pm):
            assert got[j][k] == lift % p


def test_approx_mod_down_value():
    Qm = chain(3, 50)
    Pm = chain(2, 55, avoid=Qm)
    xq, qrows = rand_stack(Qm)
    xp, prows = rand_stack(Pm)
    got = ints(jax.jit(
        lambda a, b: rns.approx_mod_down(a, b, Qm, Pm))(xq, xp))
    P = 1
    for p in Pm:
        P *= p
    # oracle: (x_q - lift(x_p)) * P^{-1} mod q_i, lift = approx CRT lift
    for k in range(N):
        lift = 0
        for j, p in enumerate(Pm):
            ph = P // p
            lift += (prows[j][k] * pow(ph % p, -1, p) % p) * ph
        for i, q in enumerate(Qm):
            expected = (qrows[i][k] - lift) * pow(P % q, -1, q) % q
            assert got[i][k] == expected


def test_rescale_matches_rounding():
    """drop_last_and_scale == round(X / q_last) for centered values."""
    Qm = chain(3, 45)
    x, rows = rand_stack(Qm)
    got = ints(jax.jit(lambda a: rns.drop_last_and_scale(a, Qm))(x))
    X, Q = crt(rows, Qm)
    q_last = Qm[-1]
    for k in range(N):
        v = X[k] if X[k] <= Q // 2 else X[k] - Q  # centered
        rounded = (2 * v + q_last) // (2 * q_last)  # round half up
        for i, q in enumerate(Qm[:-1]):
            assert got[i][k] == rounded % q, f"coeff {k} tower {i}"


def test_exact_switch_basis():
    Rm = chain(3, 50)
    Qm = chain(2, 55, avoid=Rm)
    x, rows = rand_stack(Rm)
    got = ints(jax.jit(lambda a: rns.exact_switch_basis(a, Rm, Qm))(x))
    X, R = crt(rows, Rm)
    for k in range(N):
        for i, q in enumerate(Qm):
            assert got[i][k] == X[k] % q, f"coeff {k} tower {i}"


def test_scale_and_round_decrypt_shape():
    """round(t*X/Q) mod t — the BFV decrypt scaling (S = Q, divisor = Q)."""
    t = 65537
    Qm = chain(3, 50)
    x, rows = rand_stack(Qm)
    got = ints(jax.jit(
        lambda a: rns.scale_and_round(a, Qm, (t,), t, Qm))(x))
    X, Q = crt(rows, Qm)
    for k in range(N):
        expected = (2 * t * X[k] + Q) // (2 * Q) % t  # round half up
        assert got[0][k] == expected, f"coeff {k}"


def test_scale_and_round_mult_shape():
    """round(t*X/Q) mod r_j for S = Q∪R, output over R (BFV mult scaling)."""
    t = 65537
    Qm = chain(2, 45)
    Rm = chain(3, 50, avoid=Qm)
    Sm = Qm + Rm
    x, rows = rand_stack(Sm)
    got = ints(jax.jit(
        lambda a: rns.scale_and_round(a, Sm, Rm, t, Qm))(x))
    X, S = crt(rows, Sm)
    Q = 1
    for q in Qm:
        Q *= q
    for k in range(N):
        expected = (2 * t * X[k] + Q) // (2 * Q)
        for j, r in enumerate(Rm):
            assert got[j][k] == expected % r, f"coeff {k} tower {j}"
