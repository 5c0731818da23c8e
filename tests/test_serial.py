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


def test_binfhe_roundtrip(tmp_path):
    """BINFHE context / secret / LWE ct / bootstrap key serialization
    (role of binfhecontext-ser.h + lwe/rgsw *-ser headers)."""
    import numpy as np
    from openfhe_tpu.models import binfhe
    from openfhe_tpu.utils import serial
    rng = np.random.default_rng(5)
    ctx = binfhe.gen_context("TOY")
    sk = binfhe.keygen(ctx, rng)
    ct = binfhe.encrypt(ctx, sk, 1, rng)

    p = tmp_path / "ctx.npz"
    serial.save(ctx, str(p)); ctx2 = serial.load(str(p))
    assert ctx2.params == ctx.params

    p = tmp_path / "sk.npz"
    serial.save(sk, str(p)); sk2 = serial.load(str(p))
    assert np.array_equal(sk2.s_lwe, sk.s_lwe)
    assert np.array_equal(sk2.z_ring, sk.z_ring)

    p = tmp_path / "ct.npz"
    serial.save(ct, str(p)); ct2 = serial.load(str(p))
    assert binfhe.decrypt(ctx2, sk2, ct2) == 1

    bk = binfhe.bootstrap_keygen(ctx, sk, rng)
    p = tmp_path / "bk.npz"
    serial.save(bk, str(p)); bk2 = serial.load(str(p))
    out = binfhe.eval_gate(ctx, "AND", bk2, ct,
                           binfhe.encrypt(ctx, sk, 1, rng))
    assert binfhe.decrypt(ctx, sk, out) == 1


def test_binfhe_lmkcdey_key_roundtrip(tmp_path):
    """LMKCDEYKey (ek/ak/ks arrays) serialization round-trip."""
    import numpy as np
    from openfhe_tpu.models import binfhe
    from openfhe_tpu.utils import serial
    rng = np.random.default_rng(6)
    ctx = binfhe.gen_context(binfhe.toy_lmk_params())
    sk = binfhe.keygen(ctx, rng)
    bk = binfhe.bootstrap_keygen(ctx, sk, rng)
    assert type(bk).__name__ == "LMKCDEYKey"
    p = tmp_path / "lmk.npz"
    serial.save(bk, str(p)); bk2 = serial.load(str(p))
    for name in ("ek_lo", "ek_hi", "ak_lo", "ak_hi", "ks_a", "ks_b"):
        assert np.array_equal(np.asarray(getattr(bk2, name)),
                              np.asarray(getattr(bk, name)))
    ct0 = binfhe.encrypt(ctx, sk, 0, rng)
    ct1 = binfhe.encrypt(ctx, sk, 1, rng)
    out = binfhe.eval_gate(ctx, "OR", bk2, ct0, ct1)
    assert binfhe.decrypt(ctx, sk, out) == 1
