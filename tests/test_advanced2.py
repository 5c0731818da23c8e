"""AdvancedSHE additions: Paterson-Stockmeyer Chebyshev, EvalSum,
EvalInnerProduct, EvalMerge, EvalNegate, Chebyshev function wrappers
(reference: base-advancedshe.cpp, ckksrns-utils.cpp EvalChebyshevSeriesPS,
cryptocontext.h EvalLogistic/EvalDivide)."""

import numpy as np
import pytest

from openfhe_tpu.models import ckks, ckks_advanced as adv

RNG = np.random.default_rng(77)


@pytest.fixture(scope="module")
def setup():
    params = ckks.CKKSParams(ring_dim=128, mult_depth=9,
                             scaling_mod_size=40, first_mod_size=55, dnum=2)
    ctx = ckks.gen_context(params)
    pk, sk = ckks.keygen(ctx, RNG)
    evk = ckks.relin_keygen(ctx, sk, RNG)
    return ctx, pk, sk, evk


def test_chebyshev_ps_matches_linear(setup):
    ctx, pk, sk, evk = setup
    coeffs = adv.chebyshev_coefficients(
        lambda x: np.cos(2 * np.pi * x), -1.0, 1.0, 20)
    x = np.linspace(-0.9, 0.9, ctx.params.num_slots)
    ct = ckks.encrypt(ctx, pk, x, RNG)
    out_ps = adv.eval_chebyshev_ps(ctx, ct, coeffs, -1.0, 1.0, evk)
    dec = ckks.decrypt(ctx, sk, out_ps).real
    want = np.cos(2 * np.pi * x)
    assert np.max(np.abs(dec - want)) < 1e-3, np.max(np.abs(dec - want))
    # PS must use fewer levels than the series degree
    assert out_ps.towers >= ct.towers - 7


def test_logistic_and_divide(setup):
    ctx, pk, sk, evk = setup
    x = np.linspace(1.0, 3.0, ctx.params.num_slots)
    ct = ckks.encrypt(ctx, pk, x, RNG)
    out = adv.eval_divide(ctx, ct, 1.0, 3.0, 24, evk)
    dec = ckks.decrypt(ctx, sk, out).real
    assert np.max(np.abs(dec - 1.0 / x)) < 2e-3

    x2 = np.linspace(-4.0, 4.0, ctx.params.num_slots)
    ct2 = ckks.encrypt(ctx, pk, x2, RNG)
    out2 = adv.eval_logistic(ctx, ct2, -4.0, 4.0, 24, evk)
    dec2 = ckks.decrypt(ctx, sk, out2).real
    assert np.max(np.abs(dec2 - 1.0 / (1.0 + np.exp(-x2)))) < 2e-3


def test_eval_sum_and_inner_product(setup):
    ctx, pk, sk, evk = setup
    batch = 8
    rk = ckks.rot_keygen(ctx, sk, adv.sum_rotation_indices(batch), RNG)
    v1 = RNG.normal(size=ctx.params.num_slots)
    v2 = RNG.normal(size=ctx.params.num_slots)
    ct1 = ckks.encrypt(ctx, pk, v1, RNG)
    ct2 = ckks.encrypt(ctx, pk, v2, RNG)

    s = ckks.decrypt(ctx, sk, adv.eval_sum(ctx, ct1, batch, rk)).real
    # slot 0 holds the sum of the first batch (cyclic blocks)
    want0 = sum(v1[(0 + r) % ctx.params.num_slots]
                for r in range(batch))
    assert abs(s[0] - want0) < 1e-4

    ip = ckks.decrypt(ctx, sk,
                      adv.eval_inner_product(ctx, ct1, ct2, batch, evk,
                                             rk)).real
    want_ip = np.dot(v1[:batch], v2[:batch])
    assert abs(ip[0] - want_ip) < 1e-3


def test_eval_merge(setup):
    ctx, pk, sk, evk = setup
    ns = ctx.params.num_slots
    vals = [1.5, -2.25, 3.0]
    cts = [ckks.encrypt(ctx, pk, np.full(ns, v), RNG) for v in vals]
    rk = ckks.rot_keygen(ctx, sk, [ns - 1, ns - 2], RNG)
    merged = ckks.decrypt(ctx, sk, adv.eval_merge(ctx, cts, rk)).real
    assert np.max(np.abs(merged[:3] - vals)) < 1e-4


def test_eval_negate(setup):
    ctx, pk, sk, evk = setup
    v = RNG.normal(size=ctx.params.num_slots)
    ct = ckks.encrypt(ctx, pk, v, RNG)
    dec = ckks.decrypt(ctx, sk, adv.eval_negate(ct)).real
    assert np.max(np.abs(dec + v)) < 1e-6
