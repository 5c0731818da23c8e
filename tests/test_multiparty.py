"""Threshold FHE: 3-party joint keygen + distributed decryption, for all
three RNS schemes (the reference's UnitTestMultiparty contract;
``base-multiparty.cpp:47`` is Element-generic and serves CKKS, BGV and
BFV alike)."""

import numpy as np
import pytest

from openfhe_tpu.models import bfv, bgv, ckks, multiparty as mp

RNG = np.random.default_rng(321)


def _gen(scheme):
    if scheme == "bgv":
        ctx = bgv.gen_context(bgv.BGVParams(ring_dim=128, mult_depth=2,
                                            mod_size=55, dnum=2))
        return bgv, ctx
    ctx = bfv.gen_context(bfv.BFVParams(ring_dim=128, num_towers=3,
                                        mod_size=55, dnum=2))
    return bfv, ctx


@pytest.mark.parametrize("scheme", ["bgv", "bfv"])
def test_three_party_exact_schemes(scheme):
    """Joint keygen + distributed decrypt round-trips EXACT integer slots
    for BGV and BFV (the CKKS case is the approximate test below)."""
    module, ctx = _gen(scheme)
    rng = np.random.default_rng(17)
    pk1, sk1 = mp.keygen_lead(ctx, rng)
    pk2, sk2 = mp.keygen_join(ctx, pk1, rng)
    pk, sk3 = mp.keygen_join(ctx, pk2, rng)

    msg = [3, 1, 4, 1, 5, 9, 2, 6]
    ct = module.encrypt(ctx, pk, msg, rng)

    # no single share decrypts
    assert module.decrypt(ctx, sk1, ct, num_slots=8) != msg

    parts = [mp.decrypt_lead(ctx, sk1, ct, rng)]
    parts += [mp.decrypt_main(ctx, s, ct, rng) for s in (sk2, sk3)]
    assert list(mp.combine(ctx, ct, parts, num_slots=8)) == msg

    # homomorphic add under the joint key, fused decrypt still exact
    ct2 = module.eval_add(ct, ct)
    parts = [mp.decrypt_lead(ctx, sk1, ct2, rng)]
    parts += [mp.decrypt_main(ctx, s, ct2, rng) for s in (sk2, sk3)]
    want = [(2 * m) % ctx.t for m in msg]
    assert list(mp.combine(ctx, ct2, parts, num_slots=8)) == want


@pytest.mark.parametrize("scheme", ["bgv", "bfv"])
def test_interactive_eval_keys_schemes(scheme):
    """2-round joint relinearization + 1-round joint rotation keys work
    for BGV/BFV (t-scaled noise for BGV): EvalMult+Relin and EvalRotate
    under the joint key decrypt exactly via fused partials."""
    module, ctx = _gen(scheme)
    rng = np.random.default_rng(29)
    pk1, sk1 = mp.keygen_lead(ctx, rng)
    pk2, sk2 = mp.keygen_join(ctx, pk1, rng)
    pk, sk3 = mp.keygen_join(ctx, pk2, rng)
    shares = [sk1, sk2, sk3]

    r1 = [mp.evalmult_round1(ctx, sk1, rng)]
    r1.append(mp.evalmult_round1(ctx, sk2, rng, prev_key=r1[0]))
    r1.append(mp.evalmult_round1(ctx, sk3, rng, prev_key=r1[0]))
    joint_ab = mp.evalmult_accumulate_round1(r1)
    evk = mp.evalmult_finalize(
        [mp.evalmult_round2(ctx, s, joint_ab, rng) for s in shares])

    rsh = [mp.rot_keygen_share(ctx, sk1, 1, rng)]
    rsh.append(mp.rot_keygen_share(ctx, sk2, 1, rng, prev_key=rsh[0]))
    rsh.append(mp.rot_keygen_share(ctx, sk3, 1, rng, prev_key=rsh[0]))
    rot_key = mp.rot_keygen_finalize(rsh)

    n_slots = ctx.n // 2
    m1 = [(i % 7) + 1 for i in range(n_slots)]
    m2 = [(i % 5) + 2 for i in range(n_slots)]
    ct1 = module.encrypt(ctx, pk, m1, rng)
    ct2 = module.encrypt(ctx, pk, m2, rng)
    if scheme == "bgv":
        prod = module.eval_mult_relin(ct1, ct2, evk)
    else:
        prod = module.eval_mult_relin(ctx, ct1, ct2, evk)
    parts = [mp.decrypt_lead(ctx, sk1, prod, rng)]
    parts += [mp.decrypt_main(ctx, s, prod, rng) for s in (sk2, sk3)]
    got = mp.combine(ctx, prod, parts, num_slots=8)
    assert list(got) == [(a * b) % ctx.t for a, b in zip(m1[:8], m2[:8])]

    rot = module.eval_rotate(ct1, 1, rot_key)
    parts = [mp.decrypt_lead(ctx, sk1, rot, rng)]
    parts += [mp.decrypt_main(ctx, s, rot, rng) for s in (sk2, sk3)]
    got = mp.combine(ctx, rot, parts, num_slots=4)
    # packed-slot rotation moves row slots left by 1 within each row
    half = n_slots
    want = (m1[1:half] + m1[:1])[:4]
    assert list(got) == want


def test_three_party_encrypt_decrypt():
    params = ckks.CKKSParams(ring_dim=128, mult_depth=2, scaling_mod_size=40,
                             first_mod_size=55, dnum=2)
    ctx = ckks.gen_context(params)

    pk1, sk1 = mp.keygen_lead(ctx, RNG)
    pk2, sk2 = mp.keygen_join(ctx, pk1, RNG)
    pk3, sk3 = mp.keygen_join(ctx, pk2, RNG)  # final joint public key

    v = RNG.normal(size=8)
    ct = ckks.encrypt(ctx, pk3, v, RNG)

    # no single share decrypts
    partial_bad = ckks.decrypt(ctx, sk1, ct, num_slots=8)
    assert np.max(np.abs(partial_bad - v)) > 1e-2

    # distributed decryption
    p1 = mp.decrypt_lead(ctx, sk1, ct, RNG)
    p2 = mp.decrypt_main(ctx, sk2, ct, RNG)
    p3 = mp.decrypt_main(ctx, sk3, ct, RNG)
    out = mp.combine(ctx, ct, [p1, p2, p3], num_slots=8)
    assert np.max(np.abs(out - v)) < 1e-3

    # joint secret (test-only) also decrypts homomorphic sums
    sk_joint = mp.joint_secret(ctx, [sk1, sk2, sk3])
    ct2 = ckks.eval_add(ct, ct)
    out2 = ckks.decrypt(ctx, sk_joint, ct2, num_slots=8)
    assert np.max(np.abs(out2 - 2 * v)) < 1e-3


def test_interactive_evalmult_and_rotation_keys():
    """Joint relinearization key via the 2-round protocol, joint rotation
    key via the 1-round protocol (reference: threshold-fhe.cpp flow,
    MultiKeySwitchGen/MultiAddEvalKeys/MultiMultEvalKey/
    MultiAddEvalMultKeys/MultiEvalAutomorphismKeyGen)."""
    from openfhe_tpu.models import ckks
    rng = np.random.default_rng(77)
    params = ckks.CKKSParams(ring_dim=256, mult_depth=3,
                             scaling_mod_size=40, first_mod_size=50, dnum=2)
    ctx = ckks.gen_context(params)
    pk1, sk1 = mp.keygen_lead(ctx, rng)
    pk2, sk2 = mp.keygen_join(ctx, pk1, rng)
    pk, sk3 = mp.keygen_join(ctx, pk2, rng)
    shares = [sk1, sk2, sk3]

    r1 = [mp.evalmult_round1(ctx, sk1, rng)]
    r1.append(mp.evalmult_round1(ctx, sk2, rng, prev_key=r1[0]))
    r1.append(mp.evalmult_round1(ctx, sk3, rng, prev_key=r1[0]))
    joint_ab = mp.evalmult_accumulate_round1(r1)
    evk = mp.evalmult_finalize(
        [mp.evalmult_round2(ctx, s, joint_ab, rng) for s in shares])

    rsh = [mp.rot_keygen_share(ctx, sk1, 1, rng)]
    rsh.append(mp.rot_keygen_share(ctx, sk2, 1, rng, prev_key=rsh[0]))
    rsh.append(mp.rot_keygen_share(ctx, sk3, 1, rng, prev_key=rsh[0]))
    rot_key = mp.rot_keygen_finalize(rsh)

    vals1 = np.array([0.5, -0.25, 1.0, 0.75])
    vals2 = np.array([2.0, 4.0, -1.0, 0.5])
    v1 = np.tile(vals1, ctx.params.num_slots // 4)
    v2 = np.tile(vals2, ctx.params.num_slots // 4)
    ct1 = ckks.encrypt(ctx, pk, v1, rng)
    ct2 = ckks.encrypt(ctx, pk, v2, rng)
    prod = ckks.eval_mult_relin(ct1, ct2, evk)
    rot = ckks.eval_rotate(ct1, 1, rot_key)

    parts = [mp.decrypt_lead(ctx, sk1, prod, rng)]
    parts += [mp.decrypt_main(ctx, s, prod, rng) for s in (sk2, sk3)]
    dec = mp.combine(ctx, prod, parts, num_slots=4)
    assert np.max(np.abs(dec.real - vals1 * vals2)) < 1e-2

    parts = [mp.decrypt_lead(ctx, sk1, rot, rng)]
    parts += [mp.decrypt_main(ctx, s, rot, rng) for s in (sk2, sk3)]
    decr = mp.combine(ctx, rot, parts, num_slots=4)
    assert np.max(np.abs(decr.real - np.roll(v1, -1)[:4])) < 1e-2
