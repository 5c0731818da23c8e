"""PRE + advanced CKKS evaluation (auto-scaling, trees, polynomials,
Chebyshev series)."""

import numpy as np
import pytest

from openfhe_tpu.models import ckks, ckks_advanced as adv, pre

RNG = np.random.default_rng(8)


@pytest.fixture(scope="module")
def setup():
    params = ckks.CKKSParams(ring_dim=128, mult_depth=6, scaling_mod_size=40,
                             first_mod_size=50, dnum=2)
    ctx = ckks.gen_context(params)
    pk, sk = ckks.keygen(ctx, RNG)
    evk = ckks.relin_keygen(ctx, sk, RNG)
    return ctx, pk, sk, evk


def test_pre_reencrypt(setup):
    ctx, pk, sk, _ = setup
    pk2, sk2 = ckks.keygen(ctx, RNG)
    rk = pre.rekey_gen(ctx, sk, sk2, RNG)
    v = RNG.normal(size=8)
    ct = ckks.encrypt(ctx, pk, v, RNG)
    ct2 = pre.re_encrypt(ct, rk)
    out = ckks.decrypt(ctx, sk2, ct2, num_slots=8)
    assert np.max(np.abs(out - v)) < 1e-4
    # the original key must NOT decrypt the re-encrypted ct
    wrong = ckks.decrypt(ctx, sk, ct2, num_slots=8)
    assert np.max(np.abs(wrong - v)) > 1e-2


def test_pre_reencrypt_hra(setup):
    """HRA-secure PRE (reference base-pre.cpp:55-70): re-randomization via
    encrypt-zero under the target pk + 2^20 flooding noise."""
    ctx, pk, sk, _ = setup
    pk2, sk2 = ckks.keygen(ctx, RNG)
    rk = pre.rekey_gen(ctx, sk, sk2, RNG)
    v = RNG.normal(size=8)
    ct = ckks.encrypt(ctx, pk, v, RNG)
    # the re-randomizing zero-encryption is under the SENDER's pk (what
    # the reference's UnitTestPRE passes)
    ct2 = pre.re_encrypt(ct, rk, ctx=ctx, pk=pk, mode="FIXED_NOISE_HRA",
                         rng=RNG)
    out = ckks.decrypt(ctx, sk2, ct2, num_slots=8)
    assert np.max(np.abs(out - v)) < 1e-3   # 2^20 flood under 2^40 scale
    # two re-encryptions of the same ct must differ (re-randomized)
    ct3 = pre.re_encrypt(ct, rk, ctx=ctx, pk=pk, mode="FIXED_NOISE_HRA",
                         rng=RNG)
    assert not np.array_equal(np.asarray(ct2.polys[0].data.lo),
                              np.asarray(ct3.polys[0].data.lo))
    # provable-security mode computes a much larger flooding parameter
    assert pre.flooding_sigma(ctx, "NOISE_FLOODING_HRA") > pre.PRE_SD


def test_mult_auto_different_depths(setup):
    ctx, pk, sk, evk = setup
    v = RNG.normal(size=8) * 0.5
    ct = ckks.encrypt(ctx, pk, v, RNG)
    x2 = adv.mult_auto(ctx, ct, ct, evk)          # depth 1
    x3 = adv.mult_auto(ctx, x2, ct, evk)          # depths 1+0 -> 2
    out = ckks.decrypt(ctx, sk, x3, num_slots=8)
    assert np.max(np.abs(out - v**3)) < 1e-3


def test_add_many_mult_many(setup):
    ctx, pk, sk, evk = setup
    vs = [RNG.normal(size=8) * 0.7 for _ in range(5)]
    cts = [ckks.encrypt(ctx, pk, v, RNG) for v in vs]
    out = ckks.decrypt(ctx, sk, adv.add_many(ctx, cts), num_slots=8)
    assert np.max(np.abs(out - sum(vs))) < 1e-4
    out = ckks.decrypt(ctx, sk, adv.mult_many(ctx, cts[:4], evk), num_slots=8)
    expected = vs[0] * vs[1] * vs[2] * vs[3]
    assert np.max(np.abs(out - expected)) < 1e-2


def test_linear_wsum(setup):
    ctx, pk, sk, _ = setup
    vs = [RNG.normal(size=8) for _ in range(3)]
    ws = [0.5, -1.25, 2.0]
    cts = [ckks.encrypt(ctx, pk, v, RNG) for v in vs]
    out = ckks.decrypt(ctx, sk, adv.linear_wsum(ctx, cts, ws), num_slots=8)
    expected = sum(w * v for w, v in zip(ws, vs))
    assert np.max(np.abs(out - expected)) < 1e-4


def test_eval_poly(setup):
    ctx, pk, sk, evk = setup
    v = RNG.uniform(-1, 1, size=8)
    ct = ckks.encrypt(ctx, pk, v, RNG)
    coeffs = [0.25, -0.5, 1.0, 0.75]  # 0.25 - 0.5x + x^2 + 0.75x^3
    out = ckks.decrypt(ctx, sk, adv.eval_poly(ctx, ct, coeffs, evk),
                       num_slots=8)
    expected = 0.25 - 0.5 * v + v**2 + 0.75 * v**3
    assert np.max(np.abs(out - expected)) < 1e-3


def test_eval_chebyshev_exp(setup):
    """exp(x) on [-1, 1] via degree-7 Chebyshev interpolation."""
    ctx, pk, sk, evk = setup
    v = RNG.uniform(-0.9, 0.9, size=8)
    ct = ckks.encrypt(ctx, pk, v, RNG)
    coeffs = adv.chebyshev_coefficients(np.exp, -1.0, 1.0, 7)
    out = ckks.decrypt(ctx, sk,
                       adv.eval_chebyshev(ctx, ct, coeffs, -1.0, 1.0, evk),
                       num_slots=8)
    assert np.max(np.abs(out - np.exp(v))) < 1e-2


def test_fixedauto_scaling():
    """FIXEDAUTO (constants.h:59-64): ops insert rescales automatically and
    every level is treated as the nominal 2^p scale."""
    params = ckks.CKKSParams(ring_dim=128, mult_depth=4, scaling_mod_size=40,
                             first_mod_size=50, dnum=2,
                             scaling_technique="FIXEDAUTO")
    ctx = ckks.gen_context(params)
    pk, sk = ckks.keygen(ctx, RNG)
    evk = ckks.relin_keygen(ctx, sk, RNG)
    v = RNG.normal(size=8) * 0.5
    ct = ckks.encrypt(ctx, pk, v, RNG)
    x2 = adv.eval_mult_auto(ctx, ct, ct, evk)
    assert x2.scale == ctx.scale ** 2        # deg-2, not yet rescaled
    x3 = adv.eval_mult_auto(ctx, x2, ct, evk)  # auto-rescale inserted here
    s = adv.eval_add_auto(ctx, x3, ct)         # deg+level auto-aligned
    out = ckks.decrypt(ctx, sk, s, num_slots=8)
    assert np.max(np.abs(out - (v ** 3 + v))) < 1e-3


def test_flexibleautoext_scaling():
    """FLEXIBLEAUTOEXT: one extra tower, fresh ciphertexts at scale 2^(2p),
    first op rescales onto the canonical chain for free."""
    params = ckks.CKKSParams(ring_dim=128, mult_depth=3, scaling_mod_size=40,
                             first_mod_size=50, dnum=2,
                             scaling_technique="FLEXIBLEAUTOEXT")
    ctx = ckks.gen_context(params)
    assert len(ctx.q_moduli) == 5            # mult_depth + 1 + extra
    pk, sk = ckks.keygen(ctx, RNG)
    evk = ckks.relin_keygen(ctx, sk, RNG)
    v = RNG.normal(size=8) * 0.5
    ct = ckks.encrypt(ctx, pk, v, RNG)
    assert ct.scale == ctx.scale ** 2 and ct.towers == 5
    assert np.max(np.abs(ckks.decrypt(ctx, sk, ct, num_slots=8) - v)) < 1e-5
    x2 = adv.eval_mult_auto(ctx, ct, ct, evk)
    x3 = adv.eval_mult_auto(ctx, x2, ct, evk)
    s = adv.eval_add_auto(ctx, ct, x3)        # fresh + depth-3 mix
    out = ckks.decrypt(ctx, sk, s, num_slots=8)
    assert np.max(np.abs(out - (v ** 3 + v))) < 1e-4
