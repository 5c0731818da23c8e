"""CKKS bootstrap at a production-shaped ring dimension (n = 4096).

Round-4 state: bootstrap passed at n = 512 but decrypted garbage at
n >= 2^14 because the StC gap-read under-controlled the aliasing of the
mod-raise overflow I for large n/(2s). Round 5 adds the reference's
sparse-packing partial-sums fold after ModRaise
(``ckksrns-fhe.cpp:530-532``; ``ckks_bootstrap.partial_sums_fold``),
which projects the raised ciphertext onto the rotation-fixed subring and
annihilates the aliasing terms exactly. This test pins the fix at the
largest ring a CI-class CPU can turn around (n = 4096, n/(2s) = 512 —
the same large-gap regime that failed at 2^14); the full-scale evidence
at n = 2^14/2^16 on TPU is recorded in E2E_SCALE.md phase B.

Gated behind OPENFHE_TPU_BIG_TESTS=1 (compile-heavy: deep Chebyshev +
double-angle chains + 9 fold rotations).
"""

import os

import numpy as np
import pytest

from openfhe_tpu.models import ckks, ckks_bootstrap as boot

BIG = os.environ.get("OPENFHE_TPU_BIG_TESTS") == "1"
RNG = np.random.default_rng(17)


def test_partial_sum_rotations():
    # n = 4096, s = 4: gap = 512, doubling indices j*s for j = 1..256
    assert boot.partial_sum_rotations(4096, 4) == [
        4, 8, 16, 32, 64, 128, 256, 512, 1024]
    # fully-dense sparse boundary: gap = 2 -> single fold rotation
    assert boot.partial_sum_rotations(4096, 1024) == [1024]


@pytest.mark.skipif(not BIG, reason="set OPENFHE_TPU_BIG_TESTS=1")
def test_bootstrap_n4096_roundtrip():
    params = ckks.CKKSParams(ring_dim=4096, mult_depth=14,
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
