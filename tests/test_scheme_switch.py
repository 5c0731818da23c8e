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
    params = ckks.CKKSParams(ring_dim=512, mult_depth=10,
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
