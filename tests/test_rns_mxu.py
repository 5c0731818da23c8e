"""MXU digit-matmul ApproxSwitchCRTBasis must be bit-exact vs the VPU
path (ops/rns_mxu.py experiment)."""

import numpy as np

from openfhe_tpu.ops import limb, rns, rns_mxu
from openfhe_tpu.utils import nbtheory


def test_mxu_switch_basis_bit_exact():
    n = 256
    from_m = tuple(nbtheory.generate_prime_chain(6, 30, n))
    to_m = tuple(nbtheory.generate_prime_chain(7, 29, n, avoid=set(from_m)))
    rng = np.random.default_rng(0)
    x_np = np.stack([rng.integers(0, q, size=n, dtype=np.uint64)
                     for q in from_m])
    x = limb.from_int_array(x_np)
    want = np.asarray(rns.approx_switch_basis(x, from_m, to_m).lo)
    got = np.asarray(rns_mxu.approx_switch_basis_mxu(x, from_m, to_m).lo)
    assert np.array_equal(want, got)
