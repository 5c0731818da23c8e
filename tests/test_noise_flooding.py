"""CKKS NOISE_FLOODING_DECRYPT (INDCPA^D) + the BFV centered exact-switch
regression.

Mirrors the reference's UnitTestNoiseFlooding.cpp contract and the
ckks-noise-flooding.cpp two-phase flow; the BFV case pins the centered
R->Q switch in the HPS EvalMult scale-back (SwitchCRTBasis with the
nu = 0.5 nearest-rounded overflow count, ``dcrtpoly-impl.h:1193``),
without which every negative tensor coefficient picks up +R mod Q and
the mult noise sits at ~Delta/2 instead of ~2^36.
"""

import dataclasses
import math

import numpy as np
import pytest

from openfhe_tpu import dcrt
from openfhe_tpu.models import bfv, ckks


BASE = ckks.CKKSParams(ring_dim=128, mult_depth=2, scaling_mod_size=50,
                       first_mod_size=60, dnum=2,
                       decryption_noise_mode="NOISE_FLOODING_DECRYPT")


def test_noise_flooding_two_phase():
    """Estimation phase measures a positive log-noise; evaluation phase
    floods with 2^(statSec/2 + log2(sqrt(12 q)) + estimate) and still
    decrypts to the right values."""
    rng = np.random.default_rng(5)
    p1 = dataclasses.replace(BASE, execution_mode="NOISE_ESTIMATION")
    ctx1 = ckks.gen_context(p1)
    assert ctx1.params.flood_decrypt_sigma == 0.0  # no flooding in phase 1
    pk, sk = ckks.keygen(ctx1, rng)
    evk = ckks.relin_keygen(ctx1, sk, rng)
    x = np.linspace(0.1, 1.0, 8)
    ct = ckks.rescale(ckks.eval_mult_relin(
        ckks.encrypt(ctx1, pk, x, rng), ckks.encrypt(ctx1, pk, x, rng), evk))
    noise = ckks.estimate_log_error(
        ckks.decrypt(ctx1, sk, ct, num_slots=ctx1.params.num_slots), ct.scale)
    assert 0 < noise < 40

    p2 = dataclasses.replace(BASE, execution_mode="EVALUATION",
                             noise_estimate=noise)
    ctx2 = ckks.gen_context(p2)
    sigma = ctx2.params.flood_decrypt_sigma
    want_sigma = 2.0 ** (30 / 2 + math.log2(math.sqrt(12)) + noise)
    assert sigma == pytest.approx(want_sigma)
    pk2, sk2 = ckks.keygen(ctx2, rng)
    evk2 = ckks.relin_keygen(ctx2, sk2, rng)
    ct2 = ckks.rescale(ckks.eval_mult_relin(
        ckks.encrypt(ctx2, pk2, x, rng), ckks.encrypt(ctx2, pk2, x, rng),
        evk2))
    out = ckks.decrypt(ctx2, sk2, ct2, num_slots=8, rng=rng)
    assert np.max(np.abs(out.real - x * x)) < 1e-2
    # the flooding actually perturbs the phase: two decrypts differ
    out2 = ckks.decrypt(ctx2, sk2, ct2, num_slots=8, rng=rng)
    assert np.max(np.abs(out - out2)) > 0


def test_noise_flooding_requires_estimate():
    with pytest.raises(ValueError, match="noise_estimate"):
        ckks.gen_context(dataclasses.replace(BASE,
                                             execution_mode="EVALUATION"))
    with pytest.raises(ValueError, match="3 bits"):
        ckks.gen_context(dataclasses.replace(BASE,
                                             execution_mode="EVALUATION",
                                             noise_estimate=46.0))


def test_bfv_mult_noise_margin():
    """HPS EvalMult noise stays tiny (~2^36, not ~Delta/2 = 2^148): the
    signed scaled tensor must survive the R->Q switch centered. Checked
    with a 3-share joint secret, the case that overflowed before the fix."""
    from openfhe_tpu.models import multiparty as mp
    ctx = bfv.gen_context(bfv.BFVParams(ring_dim=128, num_towers=3,
                                        mod_size=55, dnum=2))
    rng = np.random.default_rng(29)
    pk, sk1 = mp.keygen_lead(ctx, rng)
    pk, sk2 = mp.keygen_join(ctx, pk, rng)
    pk, sk3 = mp.keygen_join(ctx, pk, rng)
    skj = mp.joint_secret(ctx, [sk1, sk2, sk3])
    Q = 1
    for q in ctx.q_moduli:
        Q *= q
    m1 = [3] * (ctx.n // 2)
    ct = bfv.eval_mult(ctx, bfv.encrypt(ctx, pk, m1, rng),
                       bfv.encrypt(ctx, pk, m1, rng))
    s = skj.poly(ct.basis)
    acc, sp = ct.polys[0], s
    for c in ct.polys[1:]:
        acc = dcrt.add(acc, dcrt.mul(c, sp))
        sp = dcrt.mul(sp, s)
    phase = ckks.crt_interpolate_centered(
        dcrt.to_int_rows(dcrt.to_coeff(acc)), ct.basis.moduli)
    from openfhe_tpu import encoding
    wantc = encoding.packed_encode([9] * (ctx.n // 2), ctx.n, ctx.t)
    worst = 0
    for ph, m in zip(phase, wantc):
        d = (int(ph) - (Q * int(m) + ctx.t // 2) // ctx.t) % Q
        worst = max(worst, min(d, Q - d))
    assert worst < 2 ** 45, math.log2(max(worst, 1))
