"""Sharded-vs-single-device bit-equality: the multi-chip contract.

The reference is single-process (no distributed tests exist, SURVEY §4);
here every sharded execution must produce bit-identical residues to the
single-device run — exact-value style extended to the mesh dimension.
"""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from openfhe_tpu import dcrt
from openfhe_tpu.dcrt import Format, RnsBasis
from openfhe_tpu.models import ckks
from openfhe_tpu.ops import limb, ntt
from openfhe_tpu.parallel import mesh as pmesh
from openfhe_tpu.utils import nbtheory

RNG = np.random.default_rng(555)


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return pmesh.make_mesh(8)


def test_mesh_shape(mesh8):
    assert set(mesh8.axis_names) == {"tower", "coeff"}
    assert int(np.prod(mesh8.devices.shape)) == 8


def test_ntt_sharded_bit_equality(mesh8):
    n, L = 512, 4
    moduli = tuple(nbtheory.generate_prime_chain(L, 55, n))
    plan = ntt.make_plan(n, moduli)
    rows = [[int(v) for v in RNG.integers(0, q, size=n, dtype=np.uint64)]
            for q in moduli]
    a = limb.from_int_array(np.asarray(rows, dtype=object))
    ref = ntt.forward_jit(plan, a)
    sharded_in = limb.U64(
        jax.device_put(a.lo, pmesh.poly_sharding(mesh8)),
        jax.device_put(a.hi, pmesh.poly_sharding(mesh8)))
    out = jax.jit(lambda x: ntt.forward(plan, x))(sharded_in)
    assert np.array_equal(np.asarray(ref.lo), np.asarray(out.lo))
    assert np.array_equal(np.asarray(ref.hi), np.asarray(out.hi))


def test_ckks_mult_relin_sharded_bit_equality(mesh8):
    params = ckks.CKKSParams(ring_dim=256, mult_depth=3, scaling_mod_size=40,
                             first_mod_size=50, dnum=2)
    ctx = ckks.gen_context(params)
    pk, sk = ckks.keygen(ctx, RNG)
    evk = ckks.relin_keygen(ctx, sk, RNG)
    v = RNG.normal(size=8)
    ct1 = ckks.encrypt(ctx, pk, v, RNG)
    ct2 = ckks.encrypt(ctx, pk, v, RNG)

    step = lambda a, b, k: ckks.rescale(ckks.eval_mult_relin(a, b, k))
    ref = jax.jit(step)(ct1, ct2, evk)

    s_ct1 = pmesh.shard_poly_pytree(ct1, mesh8)
    s_ct2 = pmesh.shard_poly_pytree(ct2, mesh8)
    s_evk = pmesh.shard_poly_pytree(evk, mesh8)
    out = jax.jit(step)(s_ct1, s_ct2, s_evk)

    for pr, po in zip(ref.polys, out.polys):
        assert np.array_equal(np.asarray(pr.lo), np.asarray(po.lo))
        assert np.array_equal(np.asarray(pr.hi), np.asarray(po.hi))


def test_four_step_ntt_bit_equality(mesh8):
    """Distributed four-step NTT (local NTTs + sharded transpose + twist)
    must be bit-exact vs the single-device transform, forward AND inverse."""
    from openfhe_tpu.parallel import dntt

    n1, n2 = 32, 16
    n = n1 * n2
    moduli = tuple(nbtheory.generate_prime_chain(2, 55, n))
    plan = ntt.make_plan(n, moduli)
    rows = [[int(v) for v in RNG.integers(0, q, size=n, dtype=np.uint64)]
            for q in moduli]
    x = limb.from_int_array(np.asarray(rows, dtype=object))
    ref = ntt.forward_jit(plan, x)

    xs = pmesh.shard_limbs(x, mesh8)
    got = jax.jit(
        lambda a: dntt.four_step_forward(a, n1, n2, moduli, mesh=mesh8))(xs)
    assert np.array_equal(np.asarray(ref.lo), np.asarray(got.lo))
    assert np.array_equal(np.asarray(ref.hi), np.asarray(got.hi))

    # inverse: bit-exact vs ntt.inverse AND a true round-trip
    ref_inv = ntt.inverse_jit(plan, ref)
    got_inv = jax.jit(
        lambda a: dntt.four_step_inverse(a, n1, n2, moduli, mesh=mesh8))(got)
    assert np.array_equal(np.asarray(ref_inv.lo), np.asarray(got_inv.lo))
    assert np.array_equal(np.asarray(x.lo), np.asarray(got_inv.lo))
    assert np.array_equal(np.asarray(x.hi), np.asarray(got_inv.hi))


def test_four_step_output_order_is_standard():
    """Executable proof of the slot-order contract: four-step row-major
    (c1, c2) order equals ntt.forward's bit-reversed order."""
    from openfhe_tpu.parallel import dntt

    for n1, n2 in [(32, 16), (16, 16), (64, 8)]:
        assert np.array_equal(dntt.output_perm(n1, n2), np.arange(n1 * n2))


def test_distributed_ntt_scheme_integration(mesh8):
    """set_distributed_ntt routes dcrt.to_eval/to_coeff through the
    four-step path; a full CKKS mult+relin+rescale step stays bit-exact."""
    params = ckks.CKKSParams(ring_dim=512, mult_depth=2, scaling_mod_size=40,
                             first_mod_size=50, dnum=1)
    ctx = ckks.gen_context(params)
    pk, sk = ckks.keygen(ctx, RNG)
    evk = ckks.relin_keygen(ctx, sk, RNG)
    v = RNG.normal(size=8)
    ct1 = ckks.encrypt(ctx, pk, v, RNG)
    ct2 = ckks.encrypt(ctx, pk, v, RNG)

    step = lambda a, b, k: ckks.rescale(ckks.eval_mult_relin(a, b, k))
    ref = jax.jit(step)(ct1, ct2, evk)

    dcrt.set_distributed_ntt(mesh8, min_n=512)
    try:
        s_ct1 = pmesh.shard_poly_pytree(ct1, mesh8)
        s_ct2 = pmesh.shard_poly_pytree(ct2, mesh8)
        s_evk = pmesh.shard_poly_pytree(evk, mesh8)
        out = jax.jit(step)(s_ct1, s_ct2, s_evk)
    finally:
        dcrt.set_distributed_ntt(None)

    for pr, po in zip(ref.polys, out.polys):
        assert np.array_equal(np.asarray(pr.lo), np.asarray(po.lo))
        assert np.array_equal(np.asarray(pr.hi), np.asarray(po.hi))
