"""CKKS <-> FHEW scheme switching end-to-end
(the reference's scheme-switching example contracts:
EvalCKKStoFHEW round-trips packed integers into LWE ciphertexts;
EvalFHEWtoCKKS packs gate-encoded LWE bits back into CKKS slots).

NOTE: compile-heavy (LT + deep Chebyshev); first run populates the XLA
cache. Uses a reduced n_lwe=16 FHEW toy set to bound the sine interval.
"""

import os

import numpy as np
import pytest

from openfhe_tpu.models import binfhe, ckks, scheme_switch as ss
from openfhe_tpu.utils import nbtheory

RNG = np.random.default_rng(31)


def _mini_fhew():
    Q = nbtheory.first_prime(27, 2 * 256)
    return binfhe.BinFHEParams(n_lwe=8, N=256, Q=Q, q_ks=1 << 14,
                               log_bg=10, log_bks=5, sigma=3.19)


@pytest.fixture(scope="module")
def setup():
    params = ckks.CKKSParams(ring_dim=512, mult_depth=12,
                             scaling_mod_size=35, first_mod_size=50,
                             dnum=3, secret_hw=64)
    ctx = ckks.gen_context(params)
    pk, sk = ckks.keygen(ctx, RNG)
    bctx = binfhe.gen_context(_mini_fhew())
    sk_f = binfhe.keygen(bctx, RNG)
    pre = ss.setup(ctx, bctx, slots=8, cheb_deg=56)
    keys = ss.keygen(ctx, bctx, pre, sk, sk_f, pk, RNG)
    return ctx, bctx, pre, keys, pk, sk, sk_f


@pytest.mark.skipif(os.environ.get("SKIP_SCHEME_SWITCH_TEST") == "1",
                    reason="explicitly skipped")
def test_ckks_to_fhew(setup):
    ctx, bctx, pre, keys, pk, sk, sk_f = setup
    p_msg = 8
    msgs = [0, 1, 2, 3, 4, 5, 6, 7]
    tiled = np.tile(np.array(msgs, dtype=float),
                    ctx.params.num_slots // len(msgs))
    ct = ckks.encrypt(ctx, pk, tiled, RNG)
    lwes = ss.eval_ckks_to_fhew(ctx, bctx, pre, keys, ct, len(msgs), p_msg)
    got = [binfhe.decrypt_zp(bctx, sk_f, c, p_msg) for c in lwes]
    assert got == msgs, got


@pytest.mark.skipif(os.environ.get("SKIP_SCHEME_SWITCH_TEST") == "1",
                    reason="explicitly skipped")
def test_fhew_to_ckks(setup):
    ctx, bctx, pre, keys, pk, sk, sk_f = setup
    bits = [0, 1, 1, 0, 1, 0, 0, 1]
    lwe_in = [binfhe.encrypt(bctx, sk_f, b, RNG) for b in bits]
    out = ss.eval_fhew_to_ckks(ctx, bctx, pre, keys, lwe_in)
    dec = ckks.decrypt(ctx, sk, out, num_slots=len(bits))
    assert np.max(np.abs(dec.real - np.array(bits))) < 0.12, dec.real


def _tile(ctx, vals):
    return np.tile(np.array(vals, dtype=float),
                   ctx.params.num_slots // len(vals))


@pytest.mark.skipif(os.environ.get("SKIP_SCHEME_SWITCH_TEST") == "1",
                    reason="explicitly skipped")
def test_compare_scheme_switching(setup):
    """EvalCompareSchemeSwitching (ckksrns-schemeswitching.cpp:1779-1823):
    exact comparison of CKKS values through one FHEW sign bootstrap."""
    ctx, bctx, pre, keys, pk, sk, sk_f = setup
    bk = binfhe.bootstrap_keygen(bctx, sk_f, RNG)
    p_msg = 8
    v1 = [3, 1, 2, 0, 3, 2, 1, 1]
    v2 = [1, 3, 0, 2, 1, 3, 3, 2]
    ct1 = ckks.encrypt(ctx, pk, _tile(ctx, v1), RNG)
    ct2 = ckks.encrypt(ctx, pk, _tile(ctx, v2), RNG)
    out = ss.eval_compare_scheme_switching(ctx, bctx, pre, keys, bk,
                                           ct1, ct2, len(v1), p_msg)
    dec = ckks.decrypt(ctx, sk, out, num_slots=len(v1)).real
    want = [1.0 if a < b else 0.0 for a, b in zip(v1, v2)]
    assert np.max(np.abs(dec - want)) < 0.12, dec


@pytest.mark.skipif(os.environ.get("SKIP_SCHEME_SWITCH_TEST") == "1",
                    reason="explicitly skipped")
def test_min_max_scheme_switching(setup):
    """EvalMin/MaxSchemeSwitching tournament (one round, numValues=2)."""
    ctx, bctx, pre, keys, pk, sk, sk_f = setup
    bk = binfhe.bootstrap_keygen(bctx, sk_f, RNG)
    evk = keys.evk
    p_msg = 8
    num_values = 2
    rot_idx = ss.extremum_rotation_indices(ctx, num_values)
    rot_keys = ckks.rot_keygen(ctx, sk, rot_idx, RNG)
    vals = [3, 1]
    ct = ckks.encrypt(ctx, pk, _tile(ctx, vals + [0] * 6), RNG)
    mn, ind = ss.eval_min_scheme_switching(ctx, bctx, pre, keys, bk, evk,
                                           rot_keys, ct, num_values, p_msg)
    got_min = ckks.decrypt(ctx, sk, mn, num_slots=1).real[0]
    got_ind = ckks.decrypt(ctx, sk, ind, num_slots=2).real
    assert abs(got_min - 1.0) < 0.15, got_min
    assert np.max(np.abs(got_ind - [0.0, 1.0])) < 0.15, got_ind

    mx, ind2 = ss.eval_max_scheme_switching(ctx, bctx, pre, keys, bk, evk,
                                            rot_keys, ct, num_values, p_msg)
    got_max = ckks.decrypt(ctx, sk, mx, num_slots=1).real[0]
    got_ind2 = ckks.decrypt(ctx, sk, ind2, num_slots=2).real
    assert abs(got_max - 3.0) < 0.15, got_max
    assert np.max(np.abs(got_ind2 - [1.0, 0.0])) < 0.15, got_ind2


@pytest.mark.skipif(os.environ.get("SKIP_SCHEME_SWITCH_TEST") == "1",
                    reason="explicitly skipped")
def test_min_max_scheme_switching_alt(setup):
    """The Alt variants (host-side sign replication instead of CKKS mask
    expansion, ckksrns-schemeswitching.cpp:1909-2150): numValues=4 so the
    replication actually multiplexes sign/negated-sign blocks."""
    ctx, bctx, pre, keys, pk, sk, sk_f = setup
    bk = binfhe.bootstrap_keygen(bctx, sk_f, RNG)
    evk = keys.evk
    p_msg = 8
    num_values = 4
    rot_idx = ss.extremum_rotation_indices(ctx, num_values)
    rot_keys = ckks.rot_keygen(ctx, sk, rot_idx, RNG)
    vals = [3, 1, 2, 3]
    ct = ckks.encrypt(ctx, pk, _tile(ctx, vals + [0] * 4), RNG)
    mn, ind = ss.eval_min_scheme_switching_alt(
        ctx, bctx, pre, keys, bk, evk, rot_keys, ct, num_values, p_msg)
    got_min = ckks.decrypt(ctx, sk, mn, num_slots=1).real[0]
    got_ind = ckks.decrypt(ctx, sk, ind, num_slots=4).real
    assert abs(got_min - 1.0) < 0.2, got_min
    assert np.max(np.abs(got_ind - [0, 1, 0, 0])) < 0.2, got_ind

    mx, _ = ss.eval_max_scheme_switching_alt(
        ctx, bctx, pre, keys, bk, evk, rot_keys, ct, num_values, p_msg)
    got_max = ckks.decrypt(ctx, sk, mx, num_slots=1).real[0]
    assert abs(got_max - 3.0) < 0.2, got_max
