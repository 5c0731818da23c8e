"""BFV exact-arithmetic tests: encrypt -> eval -> decrypt over Z_t must be
EXACT (the reference's BFV unittest contract)."""

import numpy as np
import pytest

from openfhe_tpu.models import bfv
from openfhe_tpu.ops.automorph import eval_perm

RNG = np.random.default_rng(4242)


@pytest.fixture(scope="module")
def setup():
    params = bfv.BFVParams(ring_dim=128, plaintext_modulus=12289,
                           num_towers=2, mod_size=55, dnum=2)
    ctx = bfv.gen_context(params)
    pk, sk = bfv.keygen(ctx, RNG)
    evk = bfv.relin_keygen(ctx, sk, RNG)
    return ctx, pk, sk, evk


def rand_slots(ctx, k=None):
    return [int(v) for v in RNG.integers(0, ctx.t, size=k or ctx.n)]


def test_encrypt_decrypt_exact(setup):
    ctx, pk, sk, _ = setup
    v = rand_slots(ctx)
    ct = bfv.encrypt(ctx, pk, v, RNG)
    assert bfv.decrypt(ctx, sk, ct) == v


def test_add_sub_exact(setup):
    ctx, pk, sk, _ = setup
    v1, v2 = rand_slots(ctx), rand_slots(ctx)
    ct1 = bfv.encrypt(ctx, pk, v1, RNG)
    ct2 = bfv.encrypt(ctx, pk, v2, RNG)
    assert bfv.decrypt(ctx, sk, bfv.eval_add(ct1, ct2)) == \
        [(a + b) % ctx.t for a, b in zip(v1, v2)]
    assert bfv.decrypt(ctx, sk, bfv.eval_sub(ct1, ct2)) == \
        [(a - b) % ctx.t for a, b in zip(v1, v2)]


def test_mult_exact(setup):
    ctx, pk, sk, evk = setup
    v1, v2 = rand_slots(ctx), rand_slots(ctx)
    ct1 = bfv.encrypt(ctx, pk, v1, RNG)
    ct2 = bfv.encrypt(ctx, pk, v2, RNG)
    ct = bfv.eval_mult(ctx, ct1, ct2)
    assert len(ct.polys) == 3
    assert bfv.decrypt(ctx, sk, ct) == \
        [a * b % ctx.t for a, b in zip(v1, v2)]


def test_mult_relin_exact(setup):
    ctx, pk, sk, evk = setup
    v1, v2 = rand_slots(ctx), rand_slots(ctx)
    ct1 = bfv.encrypt(ctx, pk, v1, RNG)
    ct2 = bfv.encrypt(ctx, pk, v2, RNG)
    ct = bfv.eval_mult_relin(ctx, ct1, ct2, evk)
    assert len(ct.polys) == 2
    assert bfv.decrypt(ctx, sk, ct) == \
        [a * b % ctx.t for a, b in zip(v1, v2)]


def test_plain_ops_exact(setup):
    ctx, pk, sk, _ = setup
    v1, v2 = rand_slots(ctx), rand_slots(ctx)
    ct = bfv.encrypt(ctx, pk, v1, RNG)
    assert bfv.decrypt(ctx, sk, bfv.eval_add_plain(ctx, ct, v2)) == \
        [(a + b) % ctx.t for a, b in zip(v1, v2)]
    assert bfv.decrypt(ctx, sk, bfv.eval_mult_plain(ctx, ct, v2)) == \
        [a * b % ctx.t for a, b in zip(v1, v2)]


def test_automorphism_exact(setup):
    import numpy as np
    from openfhe_tpu.encoding import packed_slot_perm
    ctx, pk, sk, _ = setup
    v = rand_slots(ctx)
    ct = bfv.encrypt(ctx, pk, v, RNG)
    k = 5
    rk = bfv.rot_keygen(ctx, sk, [k], RNG)[k]
    out = bfv.decrypt(ctx, sk, bfv.eval_automorphism(ct, k, rk))
    perm = eval_perm(ctx.n, k)
    perm_u = packed_slot_perm(ctx.n)
    inv = np.argsort(perm_u)
    assert out == [v[inv[perm[perm_u[j]]]] for j in range(ctx.n)]


def test_rotate_and_sum(setup):
    """EvalAtIndex row-roll + EvalSum over all slots (reference:
    EvalAtIndex / EvalSum for BFV packed plaintexts)."""
    import numpy as np
    ctx, pk, sk, _ = setup
    h = ctx.n // 2
    v = rand_slots(ctx)
    ct = bfv.encrypt(ctx, pk, v, RNG)
    r = 2
    k = bfv.rotation_galois(ctx.n, r)
    rk = bfv.rot_keygen(ctx, sk, [k], RNG)[k]
    out = bfv.decrypt(ctx, sk, bfv.eval_rotate(ct, r, rk))
    assert out == list(np.roll(v[:h], -r)) + list(np.roll(v[h:], -r))
    ks = bfv.sum_galois_indices(ctx.n)
    rks = bfv.rot_keygen(ctx, sk, ks, RNG)
    s = bfv.decrypt(ctx, sk, bfv.eval_sum(ct, rks))
    assert s == [sum(v) % ctx.t] * ctx.n


def test_eval_mult_behz_matches_hps():
    """BEHZ multiplication (FastBaseConvqToBskMontgomery / FastRNSFloorq /
    FastBaseConvSK, dcrtpoly-impl.h:2069-2380) decrypts to the same slot
    products as the HPS pipeline."""
    from openfhe_tpu.models import bfv
    rng = np.random.default_rng(55)
    params = bfv.BFVParams(ring_dim=128, plaintext_modulus=3329,
                           num_towers=2, mod_size=50, dnum=2)
    ctx = bfv.gen_context(params)
    pk, sk = bfv.keygen(ctx, rng)
    evk = bfv.relin_keygen(ctx, sk, rng)
    v1 = [int(x) for x in rng.integers(0, 3329, 8)] + [0] * (ctx.n - 8)
    v2 = [int(x) for x in rng.integers(0, 3329, 8)] + [0] * (ctx.n - 8)
    ct1 = bfv.encrypt(ctx, pk, v1, rng)
    ct2 = bfv.encrypt(ctx, pk, v2, rng)
    want = [(a * b) % 3329 for a, b in zip(v1[:8], v2[:8])]
    hps = bfv.decrypt(
        ctx, sk, bfv.relinearize(bfv.eval_mult(ctx, ct1, ct2), evk))[:8]
    behz = bfv.decrypt(
        ctx, sk, bfv.relinearize(bfv.eval_mult_behz(ctx, ct1, ct2), evk))[:8]
    assert hps == want
    assert behz == want


def test_eval_mult_povq_variants():
    """HPSPOVERQ / HPSPOVERQLEVELED (constants.h:127-128;
    bfvrns-leveledshe.cpp:208-306): both decrypt to the exact products,
    and the leveled variant actually drops towers at depth >= 2."""
    rng = np.random.default_rng(77)
    params = bfv.BFVParams(ring_dim=128, plaintext_modulus=3329,
                           num_towers=4, mod_size=50, dnum=2)
    ctx = bfv.gen_context(params)
    pk, sk = bfv.keygen(ctx, rng)
    evk = bfv.relin_keygen(ctx, sk, rng)
    v1 = [int(x) for x in rng.integers(0, 3329, 8)] + [0] * (ctx.n - 8)
    v2 = [int(x) for x in rng.integers(0, 3329, 8)] + [0] * (ctx.n - 8)
    ct1 = bfv.encrypt(ctx, pk, v1, rng)
    ct2 = bfv.encrypt(ctx, pk, v2, rng)
    want = [(a * b) % 3329 for a, b in zip(v1[:8], v2[:8])]
    povq = bfv.relinearize(bfv.eval_mult_povq(ctx, ct1, ct2), evk)
    assert bfv.decrypt(ctx, sk, povq)[:8] == want
    assert povq.noise_deg == 2

    # LEVELED drop path: force a one-tower drop through the pipeline and
    # check the result is still exact (fresh-ct noise fits Q_l easily)
    from openfhe_tpu import dcrt as _dcrt
    from openfhe_tpu.dcrt import Format as _Fmt
    fn = bfv._mult_pipeline_povq(ctx, 1)
    d0, d1, d2 = fn(ct1.polys[0].data, ct1.polys[1].data,
                    ct2.polys[0].data, ct2.polys[1].data)
    dropped = bfv.Ciphertext(tuple(
        _dcrt.make_poly(ctx.basis(), d, _Fmt.EVAL) for d in (d0, d1, d2)),
        noise_deg=2)
    assert bfv.decrypt(ctx, sk, bfv.relinearize(dropped, evk))[:8] == want

    # the noise estimator: no slack in this toy config (matches the
    # reference's FindLevelsToDrop), but positive at production scale
    assert bfv.find_levels_to_drop(ctx, 1) == 0
    big = bfv.BFVParams(ring_dim=1 << 14, plaintext_modulus=65537,
                        num_towers=10, mod_size=45, dnum=5)
    big_ctx = bfv.gen_context(big)
    assert bfv.find_levels_to_drop(big_ctx, 5) >= 1


def test_compress(setup):
    """Compress (bfvrns-leveledshe.cpp:901-934): repeated rescale to one
    tower; decryption stays exact over the shrunk basis."""
    ctx, pk, sk, evk = setup
    v1, v2 = rand_slots(ctx), rand_slots(ctx)
    ct1 = bfv.encrypt(ctx, pk, v1, RNG)
    ct2 = bfv.encrypt(ctx, pk, v2, RNG)
    prod = bfv.relinearize(bfv.eval_mult(ctx, ct1, ct2), evk)
    small = bfv.compress(ctx, prod, towers_left=1)
    assert small.basis.L == 1
    want = [(a * b) % ctx.t for a, b in zip(v1, v2)]
    assert bfv.decrypt(ctx, sk, small) == want
