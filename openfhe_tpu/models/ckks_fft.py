"""FFT-structured CKKS bootstrap linear transforms (level budgets).

Role of the reference's collapsed-FFT CoeffsToSlots/SlotsToCoeffs
(``ckksrns-fhe.cpp``: EvalBootstrapSetup level budgets :108-133,
EvalCoeffsToSlotsPrecompute / EvalCoeffsToSlots, ``ckksrns-utils.cpp``
GetCollapsedFFTParams): instead of one dense s x s linear transform
(s diagonals, 1 level), decompose the slot-evaluation matrix into
radix-2 butterfly stages and collapse them into ``budget`` sparse
factors — each costs one level and has at most 2^(layers+1)-1 nonzero
cyclic diagonals.

Math (verified numerically in tests/test_bootstrap_fft.py):
the slot-evaluation matrix Mdec[j,k] = zeta^(5^j k) (zeta a primitive
4s-th root; slots of a ciphertext read z = Mdec u where u packs the 2s
subring coefficients as u_k = c_k + i c_{k+s}) factors as

    Mdec = S_log2(s) ... S_2 S_1 P_bitrev

with DIT butterfly stages S_l: at half-block h = 2^(l-1) row pairs
(j, j+h) combine as (E + T_j O, E - T_j O), twiddles
T_j = exp(2 pi i 5^j / (8h)) — each S_l has nonzero cyclic diagonals
only at {0, +h, -h}.  Hence

    CtS  = Mdec^H / (2s) = P_bitrev . S_1^H S_2^H ... S_log^H / (2s)
    StC  = Mdec          = S_log ... S_1 . P_bitrev

TPU-first twist: the bit-reversal permutations are NOT evaluated.
CtS runs in DIF form (drops its leading P_bitrev, leaving the slots in
bit-reversed order) and StC runs in DIT form (its trailing P_bitrev
consumes exactly that order).  Everything between them — conjugation
splits, the Chebyshev sine, double-angle — is slot-pointwise and
commutes with any fixed slot permutation, so correctness is unaffected
and two full permutation transforms disappear.  (The reference keeps
natural order throughout and pays for it inside its precompute
indexing.)

Collapsing L consecutive stages multiplies their diagonal
representations: offsets live in {k * h_base : |k| < 2^L}, i.e.
2^(L+1)-1 diagonals (the reference's numRotations), done host-side on
s-vectors — no dense matrices are ever formed.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

Diags = Dict[int, np.ndarray]  # {cyclic offset r: diag vector [s]}, offsets mod s


def _rot(v: np.ndarray, r: int) -> np.ndarray:
    """rot_r(v)[i] = v[(i + r) mod s]."""
    return np.roll(v, -r)


def stage_diags(s: int, l: int) -> Diags:
    """Diagonal form of the DIT butterfly stage S_l (h = 2^(l-1))."""
    h = 1 << (l - 1)
    ln = 2 * h
    j = np.arange(s) % ln
    T_all = np.array([np.exp(2j * np.pi * pow(5, int(jj) % (4 * ln), 4 * ln)
                             / (4 * ln)) for jj in (np.arange(s) % h)])
    lower = j < h  # first half of each block
    d0 = np.where(lower, 1.0 + 0j, -T_all)
    dp = np.where(lower, T_all, 0.0)       # offset +h
    dm = np.where(lower, 0.0, 1.0 + 0j)    # offset -h (stored mod s)
    out: Diags = {0: d0, h % s: dp, (s - h) % s: dm}
    if h % s == (s - h) % s:  # s == 2h: +h and -h collide
        out = {0: d0, h % s: dp + dm}
    return out


def diag_mult(d1: Diags, d2: Diags, s: int) -> Diags:
    """Diagonal form of the matrix product M1 @ M2.

    diag_r(M1 M2)[i] = sum_p diag_p(M1)[i] * diag_{r-p}(M2)[(i+p) mod s].
    """
    out: Diags = {}
    for p, v1 in d1.items():
        for q, v2 in d2.items():
            r = (p + q) % s
            term = v1 * _rot(v2, p)
            out[r] = out.get(r, 0) + term
    return {r: v for r, v in out.items() if np.max(np.abs(v)) > 1e-13}


def diag_herm(d: Diags, s: int) -> Diags:
    """Diagonal form of the Hermitian transpose M^H."""
    return {(-r) % s: np.conj(_rot(v, r)) for r, v in d.items()}


def diag_scale(d: Diags, c: complex) -> Diags:
    return {r: v * c for r, v in d.items()}


def diag_to_dense(d: Diags, s: int) -> np.ndarray:
    M = np.zeros((s, s), dtype=np.complex128)
    for r, v in d.items():
        for i in range(s):
            M[i, (i + r) % s] = v[i]
    return M


def _split_layers(logs: int, budget: int) -> List[int]:
    """Group log2(s) butterfly layers into ``budget`` collapsed factors
    (role of GetCollapsedFFTParams' layersColl/remColl): every group gets
    floor(logs/budget) layers, the remainder spread one-each from the
    front."""
    assert 1 <= budget <= logs, (budget, logs)
    base, rem = divmod(logs, budget)
    return [base + (1 if g < rem else 0) for g in range(budget)]


def cts_factors(s: int, budget: int) -> List[Diags]:
    """Collapsed factors for CoeffsToSlots = Mdec^H/(2s) in DIF form,
    returned in APPLICATION order (first factor applied to the raised
    ciphertext first).  The 1/(2s) normalization is folded into the
    last-applied factor."""
    logs = s.bit_length() - 1
    groups = _split_layers(logs, budget)
    # application order for Mdec^H = S_1^H ... S_log^H (rightmost acts
    # first): S_log^H first.  Collapse stages from the top down.
    factors: List[Diags] = []
    l = logs
    for size in reversed(groups):  # top group applied first
        acc: Diags | None = None
        for _ in range(size):
            sh = diag_herm(stage_diags(s, l), s)
            # group matrix = S_a^H ... S_b^H (ascending l left to right):
            # later (smaller-l) stages multiply from the LEFT
            acc = sh if acc is None else diag_mult(sh, acc, s)
            l -= 1
        factors.append(acc)
    assert l == 0
    factors[-1] = diag_scale(factors[-1], 1.0 / (2 * s))
    return factors


def stc_factors(s: int, budget: int, fold: complex = 1.0) -> List[Diags]:
    """Collapsed factors for SlotsToCoeffs = Mdec in DIT form (consumes
    the bit-reversed slot order CtS leaves behind), application order.
    ``fold`` (the q0/(2 pi sigma) recovery factor) is folded into the
    last-applied factor."""
    logs = s.bit_length() - 1
    groups = _split_layers(logs, budget)
    factors: List[Diags] = []
    l = 1
    for size in groups:  # bottom group applied first
        acc: Diags | None = None
        for _ in range(size):
            st = stage_diags(s, l)
            acc = st if acc is None else diag_mult(st, acc, s)
            l += 1
        factors.append(acc)
    assert l == logs + 1
    factors[-1] = diag_scale(factors[-1], fold)
    return factors


def factors_rotations(factors: List[Diags]) -> List[int]:
    """All nonzero rotation offsets needed to evaluate the factors."""
    rots = set()
    for f in factors:
        rots |= {r for r in f if r != 0}
    return sorted(rots)


def bitrev_perm(s: int) -> np.ndarray:
    b = s.bit_length() - 1
    return np.array([int(format(i, f"0{b}b")[::-1], 2) for i in range(s)])
