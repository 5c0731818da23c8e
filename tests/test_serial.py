"""Serialization round-trips: serialize -> deserialize -> use must preserve
behavior exactly (the reference's UnitTestSerialize contract)."""

import numpy as np
import pytest

from openfhe_tpu.models import bgv, ckks
from openfhe_tpu.utils import serial

RNG = np.random.default_rng(777)


def test_ckks_roundtrip(tmp_path):
    params = ckks.CKKSParams(ring_dim=64, mult_depth=2, scaling_mod_size=40,
                             first_mod_size=50, dnum=2)
    ctx = ckks.gen_context(params)
    pk, sk = ckks.keygen(ctx, RNG)
    evk = ckks.relin_keygen(ctx, sk, RNG)
    v = RNG.normal(size=4)
    ct = ckks.encrypt(ctx, pk, v, RNG)

    for name, obj in [("ctx", ctx), ("pk", pk), ("sk", sk),
                      ("evk", evk), ("ct", ct)]:
        serial.save(obj, tmp_path / f"{name}.npz")
    ctx2 = serial.load(tmp_path / "ctx.npz")
    pk2 = serial.load(tmp_path / "pk.npz")
    sk2 = serial.load(tmp_path / "sk.npz")
    evk2 = serial.load(tmp_path / "evk.npz")
    ct2 = serial.load(tmp_path / "ct.npz")

    assert ctx2 == ctx
    # decrypt the deserialized ct with the deserialized key
    out = ckks.decrypt(ctx2, sk2, ct2, num_slots=4)
    assert np.max(np.abs(out - v)) < 1e-6
    # and the deserialized evk still relinearizes
    ctm = ckks.eval_mult_relin(ct2, ckks.encrypt(ctx2, pk2, v, RNG), evk2)
    assert np.max(np.abs(ckks.decrypt(ctx2, sk2, ctm, num_slots=4) - v * v)) < 1e-3


def test_bgv_roundtrip(tmp_path):
    params = bgv.BGVParams(ring_dim=64, mult_depth=1,
                           plaintext_modulus=12289, mod_size=50, dnum=2)
    ctx = bgv.gen_context(params)
    pk, sk = bgv.keygen(ctx, RNG)
    v = [int(x) for x in RNG.integers(0, ctx.t, size=64)]
    ct = bgv.encrypt(ctx, pk, v, RNG)
    serial.save(ctx, tmp_path / "ctx.npz")
    serial.save(sk, tmp_path / "sk.npz")
    serial.save(ct, tmp_path / "ct.npz")
    ctx2 = serial.load(tmp_path / "ctx.npz")
    sk2 = serial.load(tmp_path / "sk.npz")
    ct2 = serial.load(tmp_path / "ct.npz")
    assert bgv.decrypt(ctx2, sk2, ct2) == v
