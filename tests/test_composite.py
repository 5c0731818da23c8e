"""Composite scaling CKKS: d primes of ~p/d bits per scaling factor, all
below 2^31 so the evaluation path rides the u32 NTT engine.

Role of the reference's COMPOSITESCALING modes (constants.h
ScalingTechnique) / NATIVE_INT=32 register-word builds.
"""

import numpy as np
import pytest

from openfhe_tpu.models import ckks
from openfhe_tpu.models import ckks_advanced as adv


@pytest.fixture(scope="module")
def composite_ctx():
    params = ckks.CKKSParams(ring_dim=256, mult_depth=2, scaling_mod_size=50,
                             first_mod_size=60, dnum=2, composite_degree=2,
                             security_level="HEStd_NotSet")
    ctx = ckks.gen_context(params)
    rng = np.random.default_rng(11)
    pk, sk = ckks.keygen(ctx, rng)
    evk = ckks.relin_keygen(ctx, sk, rng)
    return ctx, pk, sk, evk, rng


def test_chain_shape_and_word_size(composite_ctx):
    ctx, *_ = composite_ctx
    assert len(ctx.q_moduli) == 2 * 3           # d * (depth+1)
    assert all(q < (1 << 31) for q in ctx.q_moduli + ctx.p_moduli)
    # each level's product tracks the nominal scaling factor
    lvl1 = ctx.q_moduli[2] * ctx.q_moduli[3]
    assert abs(lvl1 - 2.0 ** 50) / 2.0 ** 50 < 1e-3


def test_depth2_mult_and_rotate(composite_ctx):
    ctx, pk, sk, evk, rng = composite_ctx
    v1 = rng.normal(size=128) * 0.5
    v2 = rng.normal(size=128) * 0.5
    ct1 = ckks.encrypt(ctx, pk, v1, rng)
    ct2 = ckks.encrypt(ctx, pk, v2, rng)
    p1 = ckks.rescale_ctx(ctx, ckks.eval_mult_relin(ct1, ct2, evk))
    lvl = ckks.level_reduce(ct1, ct1.towers - p1.towers)
    # FIXEDMANUAL composite: snap the ~1e-5 drift |q_i*q_j - 2^p|/2^p
    lvl = ckks.Ciphertext(lvl.polys, p1.scale)
    p2 = ckks.rescale_ctx(ctx, ckks.eval_mult_relin(p1, lvl, evk))
    dec = ckks.decrypt(ctx, sk, p2)[:128]
    assert np.max(np.abs(dec.real - v1 * v2 * v1)) < 1e-3

    rk = ckks.rot_keygen(ctx, sk, [3], rng)
    dec = ckks.decrypt(ctx, sk, ckks.eval_rotate(ct1, 3, rk[3]))[:128]
    assert np.max(np.abs(dec.real - np.roll(v1, -3))) < 1e-4


def test_fixed_auto_composite(composite_ctx):
    ctx0, *_ = composite_ctx
    params = ckks.CKKSParams(ring_dim=256, mult_depth=2, scaling_mod_size=50,
                             first_mod_size=60, dnum=2, composite_degree=2,
                             scaling_technique="FIXEDAUTO",
                             security_level="HEStd_NotSet")
    ctx = ckks.gen_context(params)
    rng = np.random.default_rng(13)
    pk, sk = ckks.keygen(ctx, rng)
    evk = ckks.relin_keygen(ctx, sk, rng)
    v = rng.normal(size=128) * 0.5
    ct = ckks.encrypt(ctx, pk, v, rng)
    sq = adv.mult_fixed_auto(ctx, ct, ct, evk)
    cube = adv.mult_fixed_auto(ctx, sq, ct, evk)
    dec = ckks.decrypt(ctx, sk, ckks.compress(ctx, cube))[:128]
    assert np.max(np.abs(dec.real - v ** 3)) < 1e-3


def test_flexible_rejected():
    params = ckks.CKKSParams(ring_dim=256, mult_depth=1, composite_degree=2,
                             scaling_technique="FLEXIBLEAUTO",
                             security_level="HEStd_NotSet")
    with pytest.raises(AssertionError):
        ckks.gen_context(params)
