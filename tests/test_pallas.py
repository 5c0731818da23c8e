"""Pallas kernel vs jnp reference (interpret mode on CPU; same code runs
compiled on TPU)."""

import numpy as np

from openfhe_tpu.ops import limb, modular
from openfhe_tpu.ops.elementwise_pallas import fused_mac_mod
from openfhe_tpu.utils import nbtheory

RNG = np.random.default_rng(9)


def test_fused_mac_bit_exact():
    n, L = 2048, 3
    moduli = nbtheory.generate_prime_chain(L, 60, n)
    mod = modular.make_mod_consts(moduli, trailing_dims=1)

    def mk():
        rows = [[int(v) for v in RNG.integers(0, q, size=n, dtype=np.uint64)]
                for q in moduli]
        return limb.from_int_array(np.asarray(rows, dtype=object))

    x, y, a = mk(), mk(), mk()
    got = fused_mac_mod(x, y, a, mod)
    ref = modular.add_mod(modular.mul_mod(x, y, mod), a, mod.q)
    assert np.array_equal(np.asarray(got.lo), np.asarray(ref.lo))
    assert np.array_equal(np.asarray(got.hi), np.asarray(ref.hi))
