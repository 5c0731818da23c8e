"""Fused Pallas four-step NTT kernel: bit-equality vs the XLA transform.

Runs in Pallas interpret mode on the CPU test mesh. The Mosaic-compiled
kernel is separately validated on real TPU hardware by
``benchmarks/pallas_ntt_bench.py``; the measured bit-equality + timing
runs are recorded in ``NTT_PERF.md`` at the repo root.
"""

import numpy as np

from openfhe_tpu.ops import limb, ntt, ntt_pallas
from openfhe_tpu.utils import nbtheory

RNG = np.random.default_rng(99)


def test_pallas_forward_inverse_bit_equality():
    n, L = 512, 3
    moduli = tuple(nbtheory.generate_prime_chain(L, 55, n))
    plan = ntt.make_plan(n, moduli)
    rows = [[int(v) for v in RNG.integers(0, q, size=n, dtype=np.uint64)]
            for q in moduli]
    x = limb.from_int_array(np.asarray(rows, dtype=object))

    ref = ntt.forward_jit(plan, x)
    got = ntt_pallas.forward(x, moduli, interpret=True)
    assert np.array_equal(np.asarray(ref.lo), np.asarray(got.lo))
    assert np.array_equal(np.asarray(ref.hi), np.asarray(got.hi))

    back = ntt_pallas.inverse(got, moduli, interpret=True)
    assert np.array_equal(np.asarray(back.lo), np.asarray(x.lo))
    assert np.array_equal(np.asarray(back.hi), np.asarray(x.hi))

    ref_inv = ntt.inverse_jit(plan, ref)
    assert np.array_equal(np.asarray(back.lo), np.asarray(ref_inv.lo))


def test_pallas_uneven_split():
    n, L = 512, 2
    moduli = tuple(nbtheory.generate_prime_chain(L, 50, n))
    plan = ntt.make_plan(n, moduli)
    rows = [[int(v) for v in RNG.integers(0, q, size=n, dtype=np.uint64)]
            for q in moduli]
    x = limb.from_int_array(np.asarray(rows, dtype=object))
    ref = ntt.forward_jit(plan, x)
    got = ntt_pallas.forward(x, moduli, n1=64, n2=8, interpret=True)
    assert np.array_equal(np.asarray(ref.lo), np.asarray(got.lo))
