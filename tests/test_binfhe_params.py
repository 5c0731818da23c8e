"""Production BINFHE parameter table + public-key LWE.

Mirrors the reference's named-set coverage (``binfhecontext.cpp:118-146``
paramsMap; ``lwe-pke.cpp:59-111,153-205`` KeyGenPair/EncryptN/SwitchCTtoqn)
in the exact-value unit style of ``UnitTestFHEW.cpp``.
"""

import dataclasses

import numpy as np
import pytest

from openfhe_tpu.models import binfhe
from openfhe_tpu.utils import nbtheory


def test_reference_table_constants():
    """Spot-check exact constants against binfhecontext.cpp:118-146."""
    p = binfhe.reference_params("STD128")
    assert (p.n_lwe, p.N, p.q, p.q_ks) == (503, 1024, 1024, 1 << 14)
    assert p.B_ks == 32 and (1 << p.log_bg) == 1 << 9
    assert p.Q.bit_length() == 27 and p.dg == 3
    assert p.method == "GINX" and p.key_dist == "TERNARY"

    p = binfhe.reference_params("TOY_REF")
    assert (p.n_lwe, p.N, p.q) == (64, 512, 512)
    assert p.q_ks == p.Q and p.B_ks == 25  # PRIME modKS sentinel

    p = binfhe.reference_params("STD128_LMKCDEY")
    assert p.method == "LMKCDEY" and p.key_dist == "GAUSSIAN"
    assert (p.n_lwe, p.q_ks, p.num_auto_keys) == (446, 1 << 13, 10)

    p = binfhe.reference_params("STD256")
    assert (p.n_lwe, p.N, p.q, p.B_r) == (990, 2048, 2048, 46)


def test_reference_table_ntt_primes():
    """Every set's derived Q is prime, == 1 mod 2N, below 2^numberBits."""
    for name in binfhe._REF_TABLE:
        p = binfhe.reference_params(name)
        bits = binfhe._REF_TABLE[name][0]
        assert nbtheory.is_prime(p.Q), name
        assert p.Q % (2 * p.N) == 1, name
        assert p.Q.bit_length() == bits, name
        assert (2 * p.N) % p.q == 0, name


def test_all_named_sets_constructible():
    """All 24 reference named sets build a context (the Q >= 2^31 sets —
    STD192*, STD128Q_3/4 — ride the two-limb gadget decompose)."""
    for name in binfhe._REF_TABLE:
        ctx = binfhe.gen_context(name)
        assert ctx.params.Q == binfhe.reference_params(name).Q, name


def test_gate_reference_toy():
    """End-to-end AND/OR at the reference's TOY set: exercises q = N != 2N
    (exponent scale 2), non-power-of-two baseKS = 25, and PRIME modKS."""
    ctx = binfhe.gen_context("TOY_REF")
    rng = np.random.default_rng(7)
    sk = binfhe.keygen(ctx, rng)
    bk = binfhe.bootstrap_keygen(ctx, sk, rng)
    for x, y in [(0, 0), (0, 1), (1, 1)]:
        c1 = binfhe.encrypt(ctx, sk, x, rng)
        c2 = binfhe.encrypt(ctx, sk, y, rng)
        got = binfhe.decrypt(ctx, sk, binfhe.eval_gate(ctx, "AND", bk, c1, c2))
        assert got == (x & y), (x, y)
        got = binfhe.decrypt(ctx, sk, binfhe.eval_gate(ctx, "OR", bk, c1, c2))
        assert got == (x | y), (x, y)


def test_public_key_lwe_roundtrip():
    """KeyGenPair/EncryptN phase correctness at dimension N, then
    SwitchCTtoqn to the gate format and secret-key decrypt."""
    ctx = binfhe.gen_context("TOY")
    rng = np.random.default_rng(11)
    pk, sk = binfhe.keygen_pair(ctx, rng)
    p = ctx.params
    for m in (0, 1, 2, 3):
        ct = binfhe.encrypt_pk(ctx, pk, m, rng, p_msg=4)
        assert ct.modulus == p.Q and len(ct.a) == p.N
        phase = (ct.b - int(binfhe._matvec_mod(
            ct.a[None, :], sk.z_ring, p.Q)[0])) % p.Q
        dec = ((4 * phase + p.Q // 2) // p.Q) % 4
        assert dec == m, m
    bk = binfhe.bootstrap_keygen(ctx, sk, rng)
    for m in (0, 1):
        ct = binfhe.encrypt_pk(ctx, pk, m, rng, p_msg=4)
        small = binfhe.switch_ct_to_qn(ctx, bk, ct)
        assert small.modulus == p.q and len(small.a) == p.n_lwe
        assert binfhe.decrypt(ctx, sk, small) == m


def test_gaussian_secret_lmkcdey_gate():
    """GAUSSIAN keyDist (the reference pairs it with LMKCDEY sets) on the
    toy LMKCDEY config: gates still come out exact."""
    params = dataclasses.replace(binfhe.toy_lmk_params(),
                                 key_dist="GAUSSIAN")
    ctx = binfhe.gen_context(params)
    rng = np.random.default_rng(23)
    sk = binfhe.keygen(ctx, rng)
    assert np.abs(sk.s_lwe).max() > 1  # actually Gaussian, not ternary
    bk = binfhe.bootstrap_keygen(ctx, sk, rng)
    for x, y in [(0, 1), (1, 1)]:
        c1 = binfhe.encrypt(ctx, sk, x, rng)
        c2 = binfhe.encrypt(ctx, sk, y, rng)
        out = binfhe.eval_gate(ctx, "NAND", bk, c1, c2)
        assert binfhe.decrypt(ctx, sk, out) == 1 - (x & y), (x, y)
