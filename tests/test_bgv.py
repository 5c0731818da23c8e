"""BGV exact-arithmetic tests: encrypt -> eval -> decrypt must be EXACT over
Z_t (the reference's BGV unittest contract)."""

import numpy as np
import pytest

from openfhe_tpu.models import bgv
from openfhe_tpu.ops.automorph import eval_perm

RNG = np.random.default_rng(99)


@pytest.fixture(scope="module")
def setup():
    # t=12289 is prime, ≡ 1 mod 2n for n=512... need t ≡ 1 mod 2n: n=128 ->
    # 2n=256; 12289 = 48*256+1 ✓
    params = bgv.BGVParams(ring_dim=128, mult_depth=2,
                           plaintext_modulus=12289, mod_size=55, dnum=2)
    ctx = bgv.gen_context(params)
    pk, sk = bgv.keygen(ctx, RNG)
    evk = bgv.relin_keygen(ctx, sk, RNG)
    return ctx, pk, sk, evk


def rand_slots(ctx, k=None):
    k = k or ctx.n
    return [int(v) for v in RNG.integers(0, ctx.t, size=k)]


def test_moduli_are_plaintext_invariant(setup):
    ctx, *_ = setup
    for q in ctx.q_moduli + ctx.p_moduli:
        assert q % ctx.t == 1
        assert q % (2 * ctx.n) == 1


def test_encrypt_decrypt_exact(setup):
    ctx, pk, sk, _ = setup
    v = rand_slots(ctx)
    ct = bgv.encrypt(ctx, pk, v, RNG)
    assert bgv.decrypt(ctx, sk, ct) == v


def test_add_sub_exact(setup):
    ctx, pk, sk, _ = setup
    v1, v2 = rand_slots(ctx), rand_slots(ctx)
    ct1 = bgv.encrypt(ctx, pk, v1, RNG)
    ct2 = bgv.encrypt(ctx, pk, v2, RNG)
    assert bgv.decrypt(ctx, sk, bgv.eval_add(ct1, ct2)) == \
        [(a + b) % ctx.t for a, b in zip(v1, v2)]
    assert bgv.decrypt(ctx, sk, bgv.eval_sub(ct1, ct2)) == \
        [(a - b) % ctx.t for a, b in zip(v1, v2)]


def test_mult_relin_exact(setup):
    ctx, pk, sk, evk = setup
    v1, v2 = rand_slots(ctx), rand_slots(ctx)
    ct1 = bgv.encrypt(ctx, pk, v1, RNG)
    ct2 = bgv.encrypt(ctx, pk, v2, RNG)
    ct = bgv.eval_mult_relin(ct1, ct2, evk)
    assert bgv.decrypt(ctx, sk, ct) == \
        [a * b % ctx.t for a, b in zip(v1, v2)]


def test_mod_reduce_preserves_plaintext(setup):
    ctx, pk, sk, evk = setup
    v1, v2 = rand_slots(ctx), rand_slots(ctx)
    ct1 = bgv.encrypt(ctx, pk, v1, RNG)
    ct2 = bgv.encrypt(ctx, pk, v2, RNG)
    ct = bgv.mod_reduce(ctx, bgv.eval_mult_relin(ct1, ct2, evk))
    assert ct.towers == len(ctx.q_moduli) - 1
    assert bgv.decrypt(ctx, sk, ct) == \
        [a * b % ctx.t for a, b in zip(v1, v2)]


def test_depth2_chain(setup):
    ctx, pk, sk, evk = setup
    v = rand_slots(ctx)
    ct = bgv.encrypt(ctx, pk, v, RNG)
    ct2 = bgv.mod_reduce(ctx, bgv.eval_mult_relin(ct, ct, evk))
    ct4 = bgv.mod_reduce(ctx, bgv.eval_mult_relin(ct2, ct2, evk))
    assert bgv.decrypt(ctx, sk, ct4) == [pow(a, 4, ctx.t) for a in v]


def test_plain_ops_exact(setup):
    ctx, pk, sk, _ = setup
    v1, v2 = rand_slots(ctx), rand_slots(ctx)
    ct = bgv.encrypt(ctx, pk, v1, RNG)
    assert bgv.decrypt(ctx, sk, bgv.eval_add_plain(ctx, ct, v2)) == \
        [(a + b) % ctx.t for a, b in zip(v1, v2)]
    assert bgv.decrypt(ctx, sk, bgv.eval_mult_plain(ctx, ct, v2)) == \
        [a * b % ctx.t for a, b in zip(v1, v2)]


def test_automorphism_permutes_slots(setup):
    """sigma_k permutes packed slots by eval_perm conjugated with the
    packed 5-orbit slot order (itself validated against direct polynomial
    evaluation)."""
    import numpy as np
    from openfhe_tpu.encoding import packed_slot_perm
    ctx, pk, sk, _ = setup
    v = rand_slots(ctx)
    ct = bgv.encrypt(ctx, pk, v, RNG)
    perm_u = packed_slot_perm(ctx.n)
    inv = np.argsort(perm_u)
    for k in (5, 25, 2 * ctx.n - 1):
        rk = bgv.rot_keygen(ctx, sk, [k], RNG)[k]
        out = bgv.decrypt(ctx, sk, bgv.eval_automorphism(ct, k, rk))
        perm = eval_perm(ctx.n, k)
        want = [v[inv[perm[perm_u[j]]]] for j in range(ctx.n)]
        assert out == want, f"k={k}"


def test_rotate_rolls_rows(setup):
    """EvalAtIndex semantics: both packed rows roll left by r, and the
    row flip swaps them (reference: PackedEncoding rotation contract)."""
    import numpy as np
    ctx, pk, sk, _ = setup
    h = ctx.n // 2
    v = rand_slots(ctx)
    ct = bgv.encrypt(ctx, pk, v, RNG)
    for r in (1, 3):
        k = bgv.rotation_galois(ctx.n, r)
        rk = bgv.rot_keygen(ctx, sk, [k], RNG)[k]
        out = bgv.decrypt(ctx, sk, bgv.eval_rotate(ct, r, rk))
        want = list(np.roll(v[:h], -r)) + list(np.roll(v[h:], -r))
        assert out == want, f"r={r}"
    fk = 2 * ctx.n - 1
    rk = bgv.rot_keygen(ctx, sk, [fk], RNG)[fk]
    out = bgv.decrypt(ctx, sk, bgv.eval_flip_rows(ct, rk))
    assert out == v[h:] + v[:h]


def test_eval_sum_all_slots(setup):
    ctx, pk, sk, _ = setup
    v = rand_slots(ctx)
    ct = bgv.encrypt(ctx, pk, v, RNG)
    ks = bgv.sum_galois_indices(ctx.n)
    rk = bgv.rot_keygen(ctx, sk, ks, RNG)
    out = bgv.decrypt(ctx, sk, bgv.eval_sum(ct, rk))
    want = sum(v) % ctx.t
    assert out == [want] * ctx.n


def test_compress(setup):
    """Compress via t-preserving ModReduce down to one tower
    (rns-leveledshe.cpp:358-372)."""
    ctx, pk, sk, _ = setup
    v = rand_slots(ctx)
    ct = bgv.encrypt(ctx, pk, v, RNG)
    small = bgv.compress(ctx, ct, towers_left=1)
    assert small.basis.L == 1
    assert bgv.decrypt(ctx, sk, small) == v
