"""BV (digit-decomposition) key switching: relinearization correctness for
CKKS — parity with the reference's KeySwitchBV method."""

import numpy as np

from openfhe_tpu import dcrt, keyswitch
from openfhe_tpu.models import ckks

RNG = np.random.default_rng(77)


def test_bv_relinearize():
    params = ckks.CKKSParams(ring_dim=128, mult_depth=2, scaling_mod_size=40,
                             first_mod_size=50, dnum=2)
    ctx = ckks.gen_context(params)
    pk, sk = ckks.keygen(ctx, RNG)

    bv_params = keyswitch.BVKSParams(ctx.n, ctx.q_moduli, log_base=10)
    q_basis = ctx.basis()
    s = sk.poly(q_basis)
    s2 = dcrt.mul(s, s)
    evk = keyswitch.bv_keygen(bv_params, s, s2, RNG)

    v = RNG.normal(size=8)
    ct1 = ckks.encrypt(ctx, pk, v, RNG)
    ct2 = ckks.encrypt(ctx, pk, v, RNG)
    ctm = ckks.eval_mult(ct1, ct2)
    d0, d1 = keyswitch.bv_apply(evk, ctm.polys[2])
    relin = ckks.Ciphertext((dcrt.add(ctm.polys[0], d0),
                             dcrt.add(ctm.polys[1], d1)), ctm.scale)
    out = ckks.decrypt(ctx, sk, relin, num_slots=8)
    assert np.max(np.abs(out - v * v)) < 1e-3
