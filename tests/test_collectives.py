"""Explicit shard_map collectives vs the single-device reference:
all_to_all four-step NTT bit-equality and psum tower reduction
(SURVEY §2.7 "ICI collectives" row, hand-scheduled variant)."""

import numpy as np
import pytest

import jax

from openfhe_tpu.ops import limb, ntt
from openfhe_tpu.parallel import collectives, mesh as mesh_mod
from openfhe_tpu.utils import nbtheory


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_mod.make_mesh(8)


def test_shard_map_four_step_bit_equal(mesh8):
    n, L = 256, 3
    moduli = tuple(nbtheory.generate_prime_chain(L, 40, n))
    plan = ntt.make_plan(n, moduli)
    rng = np.random.default_rng(0)
    rows = np.stack([rng.integers(0, q, size=n, dtype=np.uint64)
                     for q in moduli])
    x = limb.from_int_array(rows)

    want = limb.to_int_array(ntt.forward_jit(plan, x))
    fn = jax.jit(lambda a: collectives.four_step_forward_shard_map(
        a, moduli, mesh8))
    got = limb.to_int_array(fn(x))
    assert np.array_equal(got, want)


def test_shard_map_four_step_u32_chain(mesh8):
    """Sub-2^31 chain: the local stages dispatch to the u32 engine inside
    shard_map and stay bit-exact."""
    n, L = 256, 2
    moduli = tuple(nbtheory.generate_prime_chain(L, 28, n))
    plan = ntt.make_plan(n, moduli)
    rng = np.random.default_rng(1)
    rows = np.stack([rng.integers(0, q, size=n, dtype=np.uint64)
                     for q in moduli])
    x = limb.from_int_array(rows)
    want = limb.to_int_array(ntt.forward_jit(plan, x))
    got = limb.to_int_array(jax.jit(
        lambda a: collectives.four_step_forward_shard_map(a, moduli,
                                                          mesh8))(x))
    assert np.array_equal(got, want)


def test_tower_psum(mesh8):
    rng = np.random.default_rng(2)
    parts = rng.integers(0, 1 << 20, size=(8, 64)).astype(np.int64)
    got = collectives.tower_psum(jax.device_put(parts), mesh8)
    assert np.array_equal(np.asarray(got), parts.sum(axis=0))
