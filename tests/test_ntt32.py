"""u32 single-limb NTT engine (moduli < 2^31): exactness + dispatch.

Covers the fast path of ``ntt.forward/inverse`` (role of the reference's
NATIVE_INT=32 transform build, ``transformnat-impl.h`` with 32-bit
NativeInteger): direct-evaluation agreement, round-trip exactness, and
bit-equality with the u64 engine and the blocked four-step schedule.
"""

import numpy as np

from openfhe_tpu.ops import limb, ntt, ntt32
from openfhe_tpu.utils import nbtheory


def _rand(moduli, n, seed=0):
    rng = np.random.default_rng(seed)
    vals = np.stack([rng.integers(0, q, size=n, dtype=np.uint64)
                     for q in moduli])
    return vals, limb.from_int_array(vals)


def test_direct_evaluation_small():
    n = 64
    moduli = tuple(nbtheory.generate_prime_chain(2, 28, n))
    vals, a = _rand(moduli, n, seed=1)
    p32 = ntt32.make_plan32(n, moduli)
    y = np.asarray(ntt32.forward(p32, a.lo))
    rev = ntt.bit_reverse_perm(n)
    for ti, q in enumerate(moduli):
        psi = nbtheory.root_of_unity(2 * n, q)
        coeffs = [int(v) for v in vals[ti]]
        for j in range(0, n, 7):
            x = pow(psi, 2 * int(rev[j]) + 1, q)
            acc, xp = 0, 1
            for c in coeffs:
                acc = (acc + c * xp) % q
                xp = xp * x % q
            assert acc == int(y[ti, j])


def test_roundtrip_and_u64_bit_equality():
    n = 512
    moduli = tuple(nbtheory.generate_prime_chain(3, 30, n))
    vals, a = _rand(moduli, n, seed=2)
    p32 = ntt32.make_plan32(n, moduli)
    y32 = ntt32.forward(p32, a.lo)
    assert np.array_equal(np.asarray(ntt32.inverse(p32, y32)),
                          np.asarray(a.lo))
    # cross-check against the u64 blocked schedule, which shares no
    # arithmetic code with ntt32 (bypasses the u32 dispatch by calling the
    # u64 internals directly)
    plan = ntt.make_plan(n, moduli)
    yb = ntt.blocked_forward(plan, a)
    assert np.array_equal(np.asarray(y32), np.asarray(yb.lo))
    assert int(np.asarray(yb.hi).max()) == 0


def test_dispatch_through_ntt_forward():
    n = 8192
    moduli = tuple(nbtheory.generate_prime_chain(2, 29, n))
    vals, a = _rand(moduli, n, seed=3)
    plan = ntt.make_plan(n, moduli)
    y = ntt.forward(plan, a)
    assert int(np.asarray(y.hi).max()) == 0
    p32 = ntt32.make_plan32(n, moduli)
    assert np.array_equal(np.asarray(y.lo),
                          np.asarray(ntt32.forward(p32, a.lo)))
    z = ntt.inverse(plan, y)
    assert np.array_equal(np.asarray(z.lo), np.asarray(a.lo))


def test_blocked32_batched_dims():
    n = 8192
    moduli = tuple(nbtheory.generate_prime_chain(2, 30, n))
    rng = np.random.default_rng(4)
    vals = np.stack([
        np.stack([rng.integers(0, q, size=n, dtype=np.uint64)
                  for q in moduli]) for _ in range(2)])
    a = limb.from_int_array(vals)
    p32 = ntt32.make_plan32(n, moduli)
    y = ntt32.forward(p32, a.lo)
    y0 = ntt32.forward(p32, a.lo[0])
    assert np.array_equal(np.asarray(y[0]), np.asarray(y0))
    assert np.array_equal(np.asarray(ntt32.inverse(p32, y)),
                          np.asarray(a.lo))
