"""Wide-modulus (Q >= 2^31) BINFHE sets + multi-input boolean gates.

Mirrors the reference's production coverage of the STD192*/STD128Q_3/4
named sets (``binfhecontext.cpp:126-142``) and the ciphertext-vector
EvalBinGate overload — MAJORITY/AND3/OR3/AND4/OR4/CMUX
(``binfhe-base-scheme.cpp:126-177``, gate constants
``rgsw-cryptoparameters.cpp:77-89``) — in the truth-table style of
``UnitTestFHEW.cpp``.

The full-gate tests at STD192 / STD128Q_3 take minutes each on a small
CPU host (n = 575-805 sequential blind-rotation steps at N = 2048 with
two-limb 50-bit arithmetic), so they are gated behind
OPENFHE_TPU_BIG_TESTS=1. Both were run to completion on 2026-08-20:
STD128Q_3 AND [0,0,0,1] / NAND [1,1,1,0] over all four input pairs
(batched), exact.

Round 5 (2026-08-21): the remaining four wide sets — STD192Q,
STD192Q_3, STD192Q_4, STD128Q_4 — were gate-verified on the real TPU
via ``tpu_binfhe_wide.py`` (AND [0,0,0,1] / OR [0,1,1,1] over all four
input pairs, one batched blind rotation per gate), all exact; timings
in E2E_SCALE.md's BINFHE section. Every wide set has now run gates to
completion.
"""

import itertools
import os

import numpy as np
import pytest

from openfhe_tpu.models import binfhe
from openfhe_tpu.ops import limb

WIDE_SETS = ["STD192", "STD192Q", "STD192Q_3", "STD192Q_4",
             "STD128Q_3", "STD128Q_4"]

BIG = os.environ.get("OPENFHE_TPU_BIG_TESTS") == "1"


@pytest.mark.parametrize("name", WIDE_SETS)
def test_wide_signed_decompose_exact(name):
    """Two-limb signed gadget decompose reconstructs exactly and keeps
    every digit within +-B/2 at each wide set's (Q, B_g)."""
    p = binfhe.reference_params(name)
    assert p.Q.bit_length() > 30, name
    dec = binfhe._make_signed_decompose(p)
    rng = np.random.default_rng(0)
    vals = rng.integers(0, p.Q, size=(2, 2, p.N), dtype=np.uint64)
    out = limb.to_int_array(dec(limb.from_int_array(vals)))
    B = 1 << p.log_bg
    recon = np.zeros((2, 2, p.N), dtype=object)
    for d in range(p.dg):
        recon[:, 0] = (recon[:, 0] + out[:, d].astype(object)
                       * pow(B, d, p.Q)) % p.Q
        recon[:, 1] = (recon[:, 1] + out[:, p.dg + d].astype(object)
                       * pow(B, d, p.Q)) % p.Q
    assert (recon == vals.astype(object)).all(), name
    centered = np.where(out > p.Q // 2, out.astype(object) - p.Q,
                        out.astype(object))
    assert max(abs(int(v)) for v in centered.reshape(-1)) <= B // 2


def _enc_p(ctx, sk, bit, p, rng):
    return binfhe.encrypt_zp(ctx, sk, bit, p, rng)


def test_multi_input_gates_toy():
    """Full truth tables for MAJORITY/AND3/OR3 (8 rows) and AND4/OR4
    (16 rows), each as ONE batched blind rotation."""
    ctx = binfhe.gen_context("TOY")
    rng = np.random.default_rng(3)
    sk = binfhe.keygen(ctx, rng)
    bk = binfhe.bootstrap_keygen(ctx, sk, rng)
    cases = [("MAJORITY", 3, lambda b: int(sum(b) >= 2)),
             ("AND3", 3, lambda b: b[0] & b[1] & b[2]),
             ("OR3", 3, lambda b: b[0] | b[1] | b[2]),
             ("AND4", 4, lambda b: b[0] & b[1] & b[2] & b[3]),
             ("OR4", 4, lambda b: b[0] | b[1] | b[2] | b[3])]
    for gate, arity, fn in cases:
        p = binfhe.MULTI_GATES[gate][1]
        combos = list(itertools.product((0, 1), repeat=arity))
        batches = [[_enc_p(ctx, sk, x, p, rng) for x in c] for c in combos]
        outs = binfhe.eval_gate_vec_batch(ctx, gate, bk, batches)
        got = [binfhe.decrypt(ctx, sk, o) for o in outs]
        assert got == [fn(c) for c in combos], gate


def test_cmux_toy():
    ctx = binfhe.gen_context("TOY")
    rng = np.random.default_rng(9)
    sk = binfhe.keygen(ctx, rng)
    bk = binfhe.bootstrap_keygen(ctx, sk, rng)
    for d0, d1, s in [(0, 1, 0), (0, 1, 1), (1, 0, 0), (1, 0, 1)]:
        cts = [binfhe.encrypt(ctx, sk, v, rng) for v in (d0, d1, s)]
        out = binfhe.eval_cmux(ctx, bk, *cts)
        assert binfhe.decrypt(ctx, sk, out) == (d1 if s else d0)


def test_multi_gate_arity_and_independence_checks():
    ctx = binfhe.gen_context("TOY")
    rng = np.random.default_rng(1)
    sk = binfhe.keygen(ctx, rng)
    ct = binfhe.encrypt(ctx, sk, 1, rng)
    ct2 = binfhe.encrypt(ctx, sk, 1, rng)
    with pytest.raises(ValueError, match="exactly 3"):
        binfhe.eval_gate_vec_batch(ctx, "AND3", None, [[ct, ct2]])
    with pytest.raises(ValueError, match="independent"):
        binfhe.eval_gate_vec_batch(ctx, "MAJORITY", None, [[ct, ct2, ct]])


@pytest.mark.skipif(not BIG, reason="set OPENFHE_TPU_BIG_TESTS=1")
@pytest.mark.parametrize("name", ["STD192", "STD128Q_3"])
def test_wide_set_gates(name):
    """AND/OR truth tables at the 192-bit-secure / 128-bit-quantum depth-3
    production sets (one batched blind rotation per gate)."""
    ctx = binfhe.gen_context(name)
    rng = np.random.default_rng(5)
    sk = binfhe.keygen(ctx, rng)
    bk = binfhe.bootstrap_keygen(ctx, sk, rng)
    pairs = [(0, 0), (0, 1), (1, 0), (1, 1)]
    c1 = [binfhe.encrypt(ctx, sk, x, rng) for x, _ in pairs]
    c2 = [binfhe.encrypt(ctx, sk, y, rng) for _, y in pairs]
    outs = binfhe.eval_gate_batch(ctx, "AND", bk, c1, c2)
    assert [binfhe.decrypt(ctx, sk, o) for o in outs] == [0, 0, 0, 1]
    outs = binfhe.eval_gate_batch(ctx, "OR", bk, c1, c2)
    assert [binfhe.decrypt(ctx, sk, o) for o in outs] == [0, 1, 1, 1]
