"""Threshold FHE: 3-party joint keygen + distributed decryption
(the reference's UnitTestMultiparty contract)."""

import numpy as np

from openfhe_tpu.models import ckks, multiparty as mp

RNG = np.random.default_rng(321)


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
