"""BINFHE gate truth tables (the reference's UnitTestFHEW contract) on the
TOY parameter set."""

import numpy as np
import pytest

from openfhe_tpu.models import binfhe

RNG = np.random.default_rng(1234)


@pytest.fixture(scope="module")
def setup():
    ctx = binfhe.gen_context("TOY")
    sk = binfhe.keygen(ctx, RNG)
    bk = binfhe.bootstrap_keygen(ctx, sk, RNG)
    return ctx, sk, bk


def test_lwe_encrypt_decrypt(setup):
    ctx, sk, _ = setup
    for bit in (0, 1):
        for _ in range(4):
            ct = binfhe.encrypt(ctx, sk, bit, RNG)
            assert binfhe.decrypt(ctx, sk, ct) == bit


def test_not_gate(setup):
    ctx, sk, _ = setup
    for bit in (0, 1):
        ct = binfhe.encrypt(ctx, sk, bit, RNG)
        assert binfhe.decrypt(ctx, sk, binfhe.eval_not(ctx, ct)) == 1 - bit


@pytest.mark.parametrize("gate,table", [
    ("AND", [0, 0, 0, 1]),
    ("NAND", [1, 1, 1, 0]),
    ("OR", [0, 1, 1, 1]),
    ("NOR", [1, 0, 0, 0]),
    ("XOR", [0, 1, 1, 0]),
    ("XNOR", [1, 0, 0, 1]),
])
def test_gate_truth_table(setup, gate, table):
    """Whole truth table bootstrapped as ONE batch (4 gates, one scan)."""
    ctx, sk, bk = setup
    combos = [(0, 0), (0, 1), (1, 0), (1, 1)]
    cts1 = [binfhe.encrypt(ctx, sk, m1, RNG) for m1, _ in combos]
    cts2 = [binfhe.encrypt(ctx, sk, m2, RNG) for _, m2 in combos]
    outs = binfhe.eval_gate_batch(ctx, gate, bk, cts1, cts2)
    got = [binfhe.decrypt(ctx, sk, o) for o in outs]
    assert got == table, f"{gate}: {got}"


def test_bootstrap_refresh_and_chain(setup):
    """Refresh keeps the bit; (a NAND b) NAND (a NAND b) == a AND b."""
    ctx, sk, bk = setup
    ct0 = binfhe.encrypt(ctx, sk, 0, RNG)
    ct1 = binfhe.encrypt(ctx, sk, 1, RNG)
    assert binfhe.decrypt(ctx, sk, binfhe.bootstrap(ctx, bk, ct0)) == 0
    assert binfhe.decrypt(ctx, sk, binfhe.bootstrap(ctx, bk, ct1)) == 1
    nands = binfhe.eval_gate_batch(ctx, "NAND", bk, [ct0, ct1], [ct1, ct1])
    outs = binfhe.eval_gate_batch(ctx, "NAND", bk, nands, nands)
    assert [binfhe.decrypt(ctx, sk, o) for o in outs] == [0, 1]


def test_eval_func_lut(setup):
    """Programmable bootstrapping with a negacyclic LUT over Z_8
    (reference: EvalFunc)."""
    ctx, sk, bk = setup
    p = 8
    lut = [0, 1, 2, 3, 0, 7, 6, 5]  # negacyclic: lut[m+4] = -lut[m] mod 8
    for m in (1, 3, 5):
        ct = binfhe.encrypt_zp(ctx, sk, m, p, RNG)
        out = binfhe.eval_func(ctx, bk, ct, lut, p)
        assert binfhe.decrypt_zp(ctx, sk, out, p) == lut[m]


def test_eval_sign(setup):
    ctx, sk, bk = setup
    p = 8
    for m, expected in [(1, 1), (3, 1), (5, p - 1), (7, p - 1)]:
        ct = binfhe.encrypt_zp(ctx, sk, m, p, RNG)
        out = binfhe.eval_sign(ctx, bk, ct, p)
        assert binfhe.decrypt_zp(ctx, sk, out, p) == expected


# ---------------------------------------------------------------------------
# DM/AP accumulator (reference: rgsw-acc-dm.cpp) — same truth-table contract
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup_ap():
    ctx = binfhe.gen_context("TOY_AP")
    sk = binfhe.keygen(ctx, RNG)
    bk = binfhe.bootstrap_keygen(ctx, sk, RNG)
    return ctx, sk, bk


@pytest.mark.parametrize("gate,table", [
    ("AND", [0, 0, 0, 1]),
    ("OR", [0, 1, 1, 1]),
    ("XOR", [0, 1, 1, 0]),
])
def test_gate_truth_table_ap(setup_ap, gate, table):
    ctx, sk, bk = setup_ap
    combos = [(0, 0), (0, 1), (1, 0), (1, 1)]
    cts1 = [binfhe.encrypt(ctx, sk, m1, RNG) for m1, _ in combos]
    cts2 = [binfhe.encrypt(ctx, sk, m2, RNG) for _, m2 in combos]
    outs = binfhe.eval_gate_batch(ctx, gate, bk, cts1, cts2)
    got = [binfhe.decrypt(ctx, sk, o) for o in outs]
    assert got == table, f"{gate}: {got}"


def test_bootstrap_refresh_ap(setup_ap):
    ctx, sk, bk = setup_ap
    for bit in (0, 1):
        ct = binfhe.encrypt(ctx, sk, bit, RNG)
        assert binfhe.decrypt(ctx, sk, binfhe.bootstrap(ctx, bk, ct)) == bit


# ---------------------------------------------------------------------------
# Large-precision EvalFloor / EvalSign / EvalDecomp
# (reference: binfhe-base-scheme.cpp:316-483, UnitTestFunc contract)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup_lp():
    ctx = binfhe.gen_context("TOY_LP")
    sk = binfhe.keygen(ctx, RNG)
    bk = binfhe.bootstrap_keygen(ctx, sk, RNG)
    return ctx, sk, bk


def test_eval_floor_clears_low_bits(setup_lp):
    ctx, sk, bk = setup_lp
    q = 2 * ctx.params.N
    mod = ctx.params.q_ks
    beta = 64
    for v in (1000, 5000, 12345):
        ct = binfhe.encrypt_phase(ctx, sk, v, mod, RNG)
        out = binfhe.eval_floor(ctx, bk, ct, beta)
        got = binfhe.decrypt_phase(ctx, sk, out)
        want = ((v + beta) // q) * q
        diff = min((got - want) % mod, (want - got) % mod)
        # beta bounds the INPUT noise the clearing must absorb; the
        # output carries fresh PBS noise (independent of beta, stddev
        # ~20 at this set), so allow a 2*beta residual — the margin the
        # downstream eval_sign/eval_decomp offsets are designed for.
        assert diff < 2 * beta, (v, got, want)


def test_eval_sign_large(setup_lp):
    ctx, sk, bk = setup_lp
    mod = ctx.params.q_ks
    beta = 64
    for v in (100, 7000, 9000, 16000):
        ct = binfhe.encrypt_phase(ctx, sk, v, mod, RNG)
        out = binfhe.eval_sign_large(ctx, bk, ct, beta)
        assert binfhe.decrypt_zp(ctx, sk, out, 2) == int(v >= mod // 2), v


def test_eval_decomp_first_digit(setup_lp):
    ctx, sk, bk = setup_lp
    q = 2 * ctx.params.N
    mod = ctx.params.q_ks
    v = 12345
    ct = binfhe.encrypt_phase(ctx, sk, v, mod, RNG)
    digs = binfhe.eval_decomp(ctx, bk, ct, beta=64)
    assert len(digs) >= 2
    d0 = binfhe.decrypt_phase(ctx, sk, digs[0])
    diff = min((d0 - v % q) % q, (v % q - d0) % q)
    assert diff < 16, (d0, v % q)


# ---------------------------------------------------------------------------
# LMKCDEY accumulator (reference: rgsw-acc-lmkcdey.cpp) — automorphism-orbit
# blind rotation, same truth-table contract
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup_lmk():
    ctx = binfhe.gen_context("TOY_LMKCDEY")
    sk = binfhe.keygen(ctx, RNG)
    bk = binfhe.bootstrap_keygen(ctx, sk, RNG)
    return ctx, sk, bk


@pytest.mark.parametrize("gate,table", [
    ("AND", [0, 0, 0, 1]),
    ("OR", [0, 1, 1, 1]),
    ("XOR", [0, 1, 1, 0]),
])
def test_gate_truth_table_lmkcdey(setup_lmk, gate, table):
    ctx, sk, bk = setup_lmk
    combos = [(0, 0), (0, 1), (1, 0), (1, 1)]
    cts1 = [binfhe.encrypt(ctx, sk, m1, RNG) for m1, _ in combos]
    cts2 = [binfhe.encrypt(ctx, sk, m2, RNG) for _, m2 in combos]
    outs = binfhe.eval_gate_batch(ctx, gate, bk, cts1, cts2)
    got = [binfhe.decrypt(ctx, sk, o) for o in outs]
    assert got == table, f"{gate}: {got}"


def test_bootstrap_refresh_lmkcdey(setup_lmk):
    ctx, sk, bk = setup_lmk
    for bit in (0, 1):
        ct = binfhe.encrypt(ctx, sk, bit, RNG)
        assert binfhe.decrypt(ctx, sk, binfhe.bootstrap(ctx, bk, ct)) == bit
