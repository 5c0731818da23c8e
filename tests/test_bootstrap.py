"""CKKS bootstrapping end-to-end: an exhausted (1-tower) ciphertext comes
back at a high level and still decrypts to the original values
(the reference's UnitTestBootstrap contract, sparse packing).

NOTE: compile-heavy (deep Chebyshev + double-angle chains). First run
populates the persistent XLA cache; later runs are minutes.
"""

import numpy as np
import pytest

from openfhe_tpu.models import ckks, ckks_bootstrap as boot

RNG = np.random.default_rng(11)


@pytest.mark.skipif(
    __import__("os").environ.get("SKIP_BOOTSTRAP_TEST") == "1",
    reason="explicitly skipped")
def test_bootstrap_roundtrip():
    params = ckks.CKKSParams(ring_dim=512, mult_depth=14,
                             scaling_mod_size=35, first_mod_size=50,
                             dnum=3, secret_hw=64)
    ctx = ckks.gen_context(params)
    pk, sk = ckks.keygen(ctx, RNG)
    pre = boot.setup(ctx, slots=4, K=16, r=5, cheb_deg=28)
    keys = boot.keygen(ctx, sk, pre, RNG)

    vals = np.array([0.25, -0.5, 0.75, 0.125])
    v_rep = np.tile(vals, ctx.params.num_slots // 4)
    ct = ckks.encrypt(ctx, pk, v_rep, RNG)
    ct_low = ckks.level_reduce(ct, len(ctx.q_moduli) - 1)
    assert ct_low.towers == 1

    out = boot.eval_bootstrap(ctx, keys, pre, ct_low)
    assert out.towers > 3, "bootstrap must regain usable levels"
    dec = ckks.decrypt(ctx, sk, out, num_slots=4)
    assert np.max(np.abs(dec.real - vals)) < 5e-2, dec


@pytest.mark.skipif(
    __import__("os").environ.get("SKIP_BOOTSTRAP_TEST") == "1",
    reason="explicitly skipped")
def test_bootstrap_iterative_improves_precision():
    """Two-iteration bootstrap (reference: EvalBootstrap numIterations=2,
    ckksrns-fhe.cpp:238-310) must beat the single pass by a clear margin."""
    params = ckks.CKKSParams(ring_dim=512, mult_depth=14,
                             scaling_mod_size=35, first_mod_size=50,
                             dnum=3, secret_hw=64)
    ctx = ckks.gen_context(params)
    pk, sk = ckks.keygen(ctx, RNG)
    pre = boot.setup(ctx, slots=4, K=16, r=5, cheb_deg=28)
    keys = boot.keygen(ctx, sk, pre, RNG)

    vals = np.array([0.25, -0.5, 0.75, 0.125])
    v_rep = np.tile(vals, ctx.params.num_slots // 4)
    ct = ckks.encrypt(ctx, pk, v_rep, RNG)
    ct_low = ckks.level_reduce(ct, len(ctx.q_moduli) - 1)

    out1 = boot.eval_bootstrap(ctx, keys, pre, ct_low)
    e1 = np.max(np.abs(ckks.decrypt(ctx, sk, out1, num_slots=4).real - vals))
    out2 = boot.eval_bootstrap_iterative(ctx, keys, pre, ct_low, precision=4)
    e2 = np.max(np.abs(ckks.decrypt(ctx, sk, out2, num_slots=4).real - vals))
    assert out2.towers >= 2
    assert e2 < e1 / 2, (e1, e2)
