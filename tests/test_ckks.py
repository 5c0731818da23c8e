"""CKKS end-to-end behavior tests (encrypt -> eval -> decrypt -> compare),
mirroring the reference's PKE unittest strategy (epsilon compare via
checkEquality for CKKS, ``src/pke/unittest/utils/UnitTestUtils.h``).
"""

import numpy as np
import pytest

from openfhe_tpu.models import ckks

RNG = np.random.default_rng(2024)
EPS = 1e-6


@pytest.fixture(scope="module")
def setup():
    params = ckks.CKKSParams(ring_dim=128, mult_depth=3, scaling_mod_size=40,
                             first_mod_size=50, dnum=2)
    ctx = ckks.gen_context(params)
    pk, sk = ckks.keygen(ctx, RNG)
    evk = ckks.relin_keygen(ctx, sk, RNG)
    return ctx, pk, sk, evk


def rand_vals(k=8):
    return RNG.normal(size=k) + 1j * RNG.normal(size=k)


def test_encrypt_decrypt(setup):
    ctx, pk, sk, _ = setup
    v = rand_vals()
    ct = ckks.encrypt(ctx, pk, v, RNG)
    out = ckks.decrypt(ctx, sk, ct, num_slots=len(v))
    assert np.max(np.abs(out - v)) < EPS


def test_add_sub(setup):
    ctx, pk, sk, _ = setup
    v1, v2 = rand_vals(), rand_vals()
    ct1 = ckks.encrypt(ctx, pk, v1, RNG)
    ct2 = ckks.encrypt(ctx, pk, v2, RNG)
    assert np.max(np.abs(ckks.decrypt(ctx, sk, ckks.eval_add(ct1, ct2),
                                      num_slots=8) - (v1 + v2))) < EPS
    assert np.max(np.abs(ckks.decrypt(ctx, sk, ckks.eval_sub(ct1, ct2),
                                      num_slots=8) - (v1 - v2))) < EPS


def test_mult_relin_rescale(setup):
    ctx, pk, sk, evk = setup
    v1, v2 = rand_vals(), rand_vals()
    ct1 = ckks.encrypt(ctx, pk, v1, RNG)
    ct2 = ckks.encrypt(ctx, pk, v2, RNG)
    ct = ckks.eval_mult_relin(ct1, ct2, evk)
    out = ckks.decrypt(ctx, sk, ct, num_slots=8)
    assert np.max(np.abs(out - v1 * v2)) < 1e-4
    ct_r = ckks.rescale(ct)
    assert ct_r.towers == ct.towers - 1
    out_r = ckks.decrypt(ctx, sk, ct_r, num_slots=8)
    assert np.max(np.abs(out_r - v1 * v2)) < 1e-4


def test_mult_depth_chain(setup):
    """x -> x^2 -> x^4 with rescale between (uses the full depth budget)."""
    ctx, pk, sk, evk = setup
    v = rand_vals()
    ct = ckks.encrypt(ctx, pk, v, RNG)
    ct2 = ckks.rescale(ckks.eval_square_relin(ct, evk))
    ct4 = ckks.rescale(ckks.eval_square_relin(ct2, evk))
    out = ckks.decrypt(ctx, sk, ct4, num_slots=8)
    assert np.max(np.abs(out - v**4)) < 1e-2


def test_mult_no_relin_decrypts(setup):
    ctx, pk, sk, _ = setup
    v1, v2 = rand_vals(), rand_vals()
    ct1 = ckks.encrypt(ctx, pk, v1, RNG)
    ct2 = ckks.encrypt(ctx, pk, v2, RNG)
    ct = ckks.eval_mult(ct1, ct2)
    assert len(ct.polys) == 3
    out = ckks.decrypt(ctx, sk, ct, num_slots=8)
    assert np.max(np.abs(out - v1 * v2)) < 1e-4


def test_plaintext_ops(setup):
    ctx, pk, sk, _ = setup
    v1, v2 = rand_vals(), rand_vals()
    ct = ckks.encrypt(ctx, pk, v1, RNG)
    out = ckks.decrypt(ctx, sk, ckks.eval_add_plain(ctx, ct, v2), num_slots=8)
    assert np.max(np.abs(out - (v1 + v2))) < EPS
    out = ckks.decrypt(ctx, sk, ckks.eval_mult_plain(ctx, ct, v2), num_slots=8)
    assert np.max(np.abs(out - v1 * v2)) < 1e-4


def test_rotation(setup):
    ctx, pk, sk, _ = setup
    n_slots = ctx.params.num_slots
    v = RNG.normal(size=n_slots) + 1j * RNG.normal(size=n_slots)
    ct = ckks.encrypt(ctx, pk, v, RNG)
    for r in (1, 5):
        rk = ckks.rot_keygen(ctx, sk, [r], RNG)[r]
        out = ckks.decrypt(ctx, sk, ckks.eval_rotate(ct, r, rk))
        expected = np.roll(v, -r)  # rotation by r brings slot j+r to slot j
        assert np.max(np.abs(out - expected)) < 1e-4, f"rot {r}"


def test_conjugate(setup):
    ctx, pk, sk, _ = setup
    n_slots = ctx.params.num_slots
    v = RNG.normal(size=n_slots) + 1j * RNG.normal(size=n_slots)
    ct = ckks.encrypt(ctx, pk, v, RNG)
    ck = ckks.conj_keygen(ctx, sk, RNG)
    out = ckks.decrypt(ctx, sk, ckks.eval_conjugate(ct, ck))
    assert np.max(np.abs(out - np.conj(v))) < 1e-4


def test_fast_rotation_hoisting():
    """Hoisted rotations (reference: EvalFastRotationPrecompute /
    EvalFastRotation): one digit decomposition shared by many rotations
    must match the per-rotation keyswitch path."""
    rng = np.random.default_rng(31)
    params = ckks.CKKSParams(ring_dim=128, mult_depth=2,
                             scaling_mod_size=40, first_mod_size=50, dnum=2)
    ctx = ckks.gen_context(params)
    pk, sk = ckks.keygen(ctx, rng)
    rots = [1, 3, 7]
    rk = ckks.rot_keygen(ctx, sk, rots, rng)
    conj = ckks.conj_keygen(ctx, sk, rng)
    v = (rng.normal(size=ctx.params.num_slots)
         + 1j * rng.normal(size=ctx.params.num_slots))
    ct = ckks.encrypt(ctx, pk, v, rng)
    digits = ckks.fast_rotation_precompute(ct, rk[1])
    for r in rots:
        fast = ckks.decrypt(ctx, sk, ckks.eval_fast_rotate(ct, r, rk[r],
                                                           digits))
        assert np.max(np.abs(fast - np.roll(v, -r))) < 1e-4
    fc = ckks.decrypt(ctx, sk, ckks.eval_fast_conjugate(ct, conj, digits))
    assert np.max(np.abs(fc - np.conj(v))) < 1e-4


def test_compress(setup):
    """Compress (rns-leveledshe.cpp:358-372): rescale pending degree away,
    then drop towers; precision bounded by the remaining tower."""
    ctx, pk, sk, evk = setup
    v = rand_vals()
    ct = ckks.encrypt(ctx, pk, v, RNG)
    prod = ckks.eval_mult_relin(ct, ct, evk)   # deg-2 scale
    small = ckks.compress(ctx, prod, towers_left=1)
    assert small.towers == 1
    out = ckks.decrypt(ctx, sk, small, num_slots=8)
    assert np.max(np.abs(out - v * v)) < 1e-4
