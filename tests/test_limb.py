"""Exhaustive randomized validation of 32-bit-limb u64 arithmetic against
Python's exact big integers — the ground-truth oracle for every kernel above.
"""

import numpy as np
import pytest

from openfhe_tpu.ops import limb
from openfhe_tpu.ops.limb import U64

rng = np.random.default_rng(12345)
N = 4096


def rand_u64(n=N, bits=64):
    hi_bits = max(0, bits - 32)
    lo = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    hi = rng.integers(0, 1 << hi_bits if hi_bits else 1, size=n,
                      dtype=np.uint64).astype(np.uint32)
    # sprinkle boundary values
    lo[:4] = [0, 0xFFFFFFFF, 1, 0xFFFFFFFF]
    hi[:4] = [0, (1 << hi_bits) - 1 if hi_bits else 0, 0, 0]
    return U64(lo, hi)


def ints(x: U64):
    return [int(h) << 32 | int(l) for l, h in
            zip(np.asarray(x.lo).ravel(), np.asarray(x.hi).ravel())]


def check(result: U64, expected_ints):
    got = ints(result)
    assert got == [e % (1 << 64) for e in expected_ints]


def test_add_sub():
    a, b = rand_u64(), rand_u64()
    ia, ib = ints(a), ints(b)
    check(limb.add64(a, b), [x + y for x, y in zip(ia, ib)])
    check(limb.sub64(a, b), [x - y for x, y in zip(ia, ib)])


def test_add_carry():
    a, b = rand_u64(), rand_u64()
    ia, ib = ints(a), ints(b)
    s, c = limb.add64_carry(a, b)
    check(s, [x + y for x, y in zip(ia, ib)])
    assert list(np.asarray(c)) == [(x + y) >> 64 for x, y in zip(ia, ib)]


def test_compare():
    a, b = rand_u64(), rand_u64()
    ia, ib = ints(a), ints(b)
    assert list(np.asarray(limb.geq64(a, b))) == [x >= y for x, y in zip(ia, ib)]
    assert list(np.asarray(limb.lt64(a, b))) == [x < y for x, y in zip(ia, ib)]


def test_mul32():
    a = rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32)
    a[:2] = [0xFFFFFFFF, 0]
    b[:2] = [0xFFFFFFFF, 0]
    p = limb.mul32x32(a, b)
    check(p, [int(x) * int(y) for x, y in zip(a, b)])


def test_mul64_lo_full():
    a, b = rand_u64(), rand_u64()
    ia, ib = ints(a), ints(b)
    check(limb.mul64_lo(a, b), [x * y for x, y in zip(ia, ib)])
    lo, hi = limb.mul64_full(a, b)
    check(lo, [x * y for x, y in zip(ia, ib)])
    check(hi, [(x * y) >> 64 for x, y in zip(ia, ib)])
    check(limb.mulhi64(a, b), [(x * y) >> 64 for x, y in zip(ia, ib)])


@pytest.mark.parametrize("k", [0, 1, 5, 31, 32, 33, 60, 63])
def test_shifts(k):
    a = rand_u64()
    ia = ints(a)
    check(limb.shr64(a, k), [x >> k for x in ia])
    check(limb.shl64(a, k), [x << k for x in ia])


def test_roundtrip_helpers():
    vals = [0, 1, (1 << 64) - 1, 0x123456789ABCDEF0]
    x = limb.from_int_array(vals)
    assert list(limb.to_int_array(x)) == vals
    y = limb.from_int(0xDEADBEEFCAFEBABE, (3,))
    assert list(limb.to_int_array(y)) == [0xDEADBEEFCAFEBABE] * 3
