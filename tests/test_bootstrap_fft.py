"""Collapsed-FFT CtS/StC factorization (level budgets).

Host-side exactness: the diagonal-form factor products must reproduce the
dense transform matrices (the reference's EvalCoeffsToSlotsPrecompute /
GetCollapsedFFTParams contract, ckksrns-fhe.cpp:108-133), with the DIF/DIT
bit-reversal convention cancelling between CtS and StC. Plus a full
staged-bootstrap round trip.
"""

import numpy as np
import pytest

from openfhe_tpu.models import ckks, ckks_bootstrap as boot, ckks_fft as cfft

RNG = np.random.default_rng(23)


def _mdec(s: int) -> np.ndarray:
    zeta = np.exp(2j * np.pi / (4 * s))
    e = np.array([pow(5, j, 4 * s) for j in range(s)])
    return zeta ** (np.outer(e, np.arange(s)) % (4 * s))


def _product(factors, s):
    M = np.eye(s, dtype=np.complex128)
    for f in factors:
        M = cfft.diag_to_dense(f, s) @ M
    return M


class TestFactorization:
    @pytest.mark.parametrize("s", [8, 32, 128])
    def test_cts_factors_exact(self, s):
        Md = _mdec(s)
        P = np.eye(s)[cfft.bitrev_perm(s)]
        for budget in range(1, s.bit_length()):
            M = _product(cfft.cts_factors(s, budget), s)
            # DIF form: P dropped from the left => P @ Mdec^H / (2s)
            assert np.max(np.abs(M - P @ Md.conj().T / (2 * s))) < 1e-10

    @pytest.mark.parametrize("s", [8, 32, 128])
    def test_stc_factors_exact(self, s):
        Md = _mdec(s)
        P = np.eye(s)[cfft.bitrev_perm(s)]
        for budget in range(1, s.bit_length()):
            M = _product(cfft.stc_factors(s, budget, fold=2.5), s)
            # DIT form consumes bit-reversed input => Mdec @ P
            assert np.max(np.abs(M - 2.5 * Md @ P)) < 1e-9

    def test_pipeline_permutations_cancel(self):
        """CtS then pointwise-op then StC equals the natural-order pipeline:
        StC @ diag(f) @ CtS is permutation-free for any pointwise f."""
        s = 32
        Md = _mdec(s)
        f = RNG.normal(size=s) + 1j * RNG.normal(size=s)
        cts = _product(cfft.cts_factors(s, 3), s)          # P A/2
        stc = _product(cfft.stc_factors(s, 2), s)          # Mdec P
        staged = stc @ np.diag(f[cfft.bitrev_perm(s)]) @ cts
        natural = Md @ np.diag(f) @ (Md.conj().T / (2 * s))
        assert np.max(np.abs(staged - natural)) < 1e-9

    def test_diag_counts_match_reference_formula(self):
        """A collapsed factor of L layers starting at half-block h has
        min(2^(L+1)-1, s/h) diagonals (the reference's NUM_ROTATIONS,
        improved by mod-s aliasing in the top group)."""
        s = 256
        for budget in (2, 4):
            sizes = cfft._split_layers(s.bit_length() - 1, budget)
            # cts_factors applies the TOP stage group first
            l_hi = s.bit_length() - 1
            for f, L in zip(cfft.cts_factors(s, budget), reversed(sizes)):
                h_base = 1 << (l_hi - L)  # smallest h in this group
                assert len(f) == min((1 << (L + 1)) - 1, s // h_base)
                l_hi -= L

    def test_rotation_savings(self):
        """Level budget 2 needs far fewer rotation keys than dense BSGS."""
        s = 1024
        staged = len(cfft.factors_rotations(
            cfft.cts_factors(s, 2) + cfft.stc_factors(s, 2)))
        assert staged < 100  # vs ~1023 diagonals dense


@pytest.mark.skipif(
    __import__("os").environ.get("SKIP_BOOTSTRAP_TEST") == "1",
    reason="explicitly skipped")
def test_bootstrap_staged_roundtrip():
    """End-to-end bootstrap with level_budget=(2,2) (collapsed-FFT CtS/StC)
    must match the dense path's accuracy."""
    params = ckks.CKKSParams(ring_dim=512, mult_depth=16,
                             scaling_mod_size=35, first_mod_size=50,
                             dnum=3, secret_hw=64)
    ctx = ckks.gen_context(params)
    pk, sk = ckks.keygen(ctx, RNG)
    pre = boot.setup(ctx, slots=8, K=16, r=5, cheb_deg=28,
                     level_budget=(2, 2))
    assert pre.staged
    keys = boot.keygen(ctx, sk, pre, RNG)

    vals = np.array([0.25, -0.5, 0.75, 0.125, -0.25, 0.5, -0.75, 0.0625])
    v_rep = np.tile(vals, ctx.params.num_slots // 8)
    ct = ckks.encrypt(ctx, pk, v_rep, RNG)
    ct_low = ckks.level_reduce(ct, len(ctx.q_moduli) - 1)
    assert ct_low.towers == 1

    out = boot.eval_bootstrap(ctx, keys, pre, ct_low)
    assert out.towers > 3, "staged bootstrap must regain usable levels"
    dec = ckks.decrypt(ctx, sk, out, num_slots=8)
    assert np.max(np.abs(dec.real - vals)) < 5e-2, dec
