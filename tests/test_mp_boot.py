"""Interactive multiparty CKKS bootstrapping (threshold FHE).

Mirrors the reference's tckks-interactive-mp-bootstrapping.cpp flow:
3 parties, joint public key, encrypt, exhaust levels, one-round interactive
bootstrap (AdjustScale -> RandomElementGen -> per-party Decrypt -> Add ->
Encrypt), then KEEP COMPUTING at the refreshed full level and finish with
distributed decryption.
"""

import numpy as np

from openfhe_tpu.models import ckks, multiparty as mp

RNG = np.random.default_rng(2024)


def _setup():
    params = ckks.CKKSParams(ring_dim=256, mult_depth=3, scaling_mod_size=40,
                             first_mod_size=60, dnum=2)
    ctx = ckks.gen_context(params)
    pk1, sk1 = mp.keygen_lead(ctx, RNG)
    pk2, sk2 = mp.keygen_join(ctx, pk1, RNG)
    pk3, sk3 = mp.keygen_join(ctx, pk2, RNG)
    return ctx, pk3, [sk1, sk2, sk3]


def _dist_decrypt(ctx, sks, ct, slots):
    parts = [mp.decrypt_lead(ctx, sks[0], ct, RNG)]
    parts += [mp.decrypt_main(ctx, s, ct, RNG) for s in sks[1:]]
    return mp.combine(ctx, ct, parts, slots)


def test_interactive_mp_bootstrap_refreshes_levels():
    ctx, pk, sks = _setup()
    v = np.array([0.25, -1.5, 2.0, 0.125])
    ct = ckks.encrypt(ctx, pk, v, RNG)

    # burn levels down to the compression point (plaintext squarings keep
    # the test independent of the joint relin protocol)
    ct = ckks.rescale(ckks.eval_mult_plain(ctx, ct, np.ones(4)))
    ct = ckks.rescale(ckks.eval_mult_plain(ctx, ct, np.ones(4)))
    assert ct.towers == 2

    # --- the one-round interactive bootstrap ---
    small = mp.int_mp_boot_adjust_scale(ctx, ct)
    a = mp.int_mp_boot_random_element_gen(ctx, RNG)
    shares = [mp.int_mp_boot_decrypt(ctx, s, small, a, RNG) for s in sks]
    agg = mp.int_mp_boot_add(shares)
    fresh = mp.int_mp_boot_encrypt(ctx, agg, a, small)

    assert fresh.towers == ctx.basis().L  # back to full level
    dec = _dist_decrypt(ctx, sks, fresh, 4)
    assert np.allclose(dec.real, v, atol=2e-3), (dec.real, v)

    # refreshed ciphertext must remain computable: square at full level
    sq = ckks.rescale(ckks.eval_mult_plain(ctx, fresh, v))
    dec2 = _dist_decrypt(ctx, sks, sq, 4)
    assert np.allclose(dec2.real, v * v, atol=5e-3), (dec2.real, v * v)


def test_adjust_scale_keeps_message_towers():
    ctx, pk, sks = _setup()
    v = np.array([1.0, 2.0])
    ct = ckks.encrypt(ctx, pk, v, RNG)
    small = mp.int_mp_boot_adjust_scale(ctx, ct)
    # msg towers = floor(40/60)+1 = 1, +1 mask tower
    assert small.towers == 2
    dec = _dist_decrypt(ctx, sks, small, 2)
    assert np.allclose(dec.real, v, atol=1e-3)
