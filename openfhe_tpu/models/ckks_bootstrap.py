"""CKKS bootstrapping (sparse packing, real messages).

Role of the reference's CKKSrns FHE capability
(``pke/lib/scheme/ckksrns/ckksrns-fhe.cpp``: EvalBootstrapSetup :62,
EvalBootstrapKeyGen :212, EvalBootstrap :238): raise an exhausted
ciphertext back to a high level by homomorphically evaluating the modular
reduction.

Pipeline (CCS18 structure):
  1. ModRaise: centered lift of the 1-tower ciphertext into the full chain;
     the phase becomes x = sigma*m + q0*I with |I| <~ K. The scale is
     reinterpreted as q0 so slot readings are y = x/q0.
  2. CoeffsToSlots: one slot-space linear transform (s rotations, diagonals
     derived NUMERICALLY from the embedding — no hand-derived DFT
     factorization to get wrong), then a conjugation splits the packed
     coefficients into two real-slot ciphertexts.
  3. EvalSine: Chebyshev approximation of cos(2*pi*u) on the shrunken
     range (u = (y - 1/4)/2^r) followed by r double-angle squarings gives
     sin(2*pi*y) — i.e. (2*pi/q0)*(sigma*m) up to O((m/q0)^3).
  4. SlotsToCoeffs: inverse transform, folding in q0/(2*pi*sigma),
     restores m in the coefficients at a canonical scale.  (The StC
     conjugate branch of the textbook pipeline is identically zero here:
     E = (Mc1 + i*Mc2)/2 with Mc2 = i*Mc1 exactly, so only LT_D runs.)

Matrices are s x s with s = #sparse slots (s <= n/4); all diagonal
constants are encoded at FLEXIBLEAUTO canonical scales.

Level budgets (reference: EvalBootstrapSetup levelBudget,
ckksrns-fhe.cpp:62-133): setup(..., level_budget=(be, bd)) with be or
bd > 1 switches CtS/StC to the collapsed-FFT form of ckks_fft.py —
``be``/``bd`` sparse factors of <= 2^(layers+1)-1 cyclic diagonals each,
costing one level per factor but far fewer rotations/keys than the
dense s-diagonal transform.  CtS runs decimation-in-frequency (slots
come out bit-reverse permuted), the pointwise sine doesn't care, and
StC's decimation-in-time factors consume exactly that order — the two
bit-reversal permutations cancel and are never evaluated.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Dict

import numpy as np

from .. import dcrt, encoding, keyswitch
from ..dcrt import Format
from ..ops import ntt as ntt_ops
from ..ops.limb import U64
from ..ops.modular import make_mod_consts, switch_modulus
from . import ckks
from . import ckks_advanced as adv
from . import ckks_fft as cfft
from .ckks import Ciphertext, CKKSContext


@dataclasses.dataclass
class BootstrapPrecomp:
    slots: int
    K: int            # bound on |I| in x = m + q0*I
    r: int            # double-angle iterations
    cheb_coeffs: np.ndarray
    A_half: np.ndarray    # CtS matrix (already divided by 2) [s, s]
    D: np.ndarray         # StC matrix: z = D u (the conj branch is 0)
    level_budget: tuple = (1, 1)
    cts: list | None = None   # collapsed-FFT factors (application order)
    stc: list | None = None

    @property
    def staged(self) -> bool:
        return self.level_budget != (1, 1)


@dataclasses.dataclass
class BootstrapKeys:
    evk: keyswitch.KSKey
    conj: keyswitch.KSKey
    rot: Dict[int, keyswitch.KSKey]


def stc_matrices(n: int, s: int):
    """Numerically built CtS/StC constants for s sparse slots at ring dim
    n: A maps slot values -> packed subring coeffs; LT_D(u) yields a
    ciphertext whose coefficients at the gap positions equal u's slot
    values (the conjugate branch E = (Mc1 + i*Mc2)/2 vanishes identically
    because Mc2 = i*Mc1: the upper coefficient half sits at exponent
    offset s where zeta^(5^j s) = i in every slot). Shared with scheme
    switching."""
    gap = n // (2 * s)
    reps = n // (2 * s)

    # --- CtS matrix: slot values z (real) -> packed subring coeffs
    # u_j = c_{j*gap} + i*c_{(j+s)*gap}, built numerically column by column.
    A = np.zeros((s, s), dtype=np.complex128)
    for k in range(s):
        z = np.zeros(s)
        z[k] = 1.0
        coeffs = encoding.ckks_embed_inv(np.tile(z, reps), n)
        c_sub = coeffs[::gap]
        assert np.max(np.abs(np.delete(coeffs,
                                       np.arange(0, n, gap)))) < 1e-9, \
            "replicated slots must give subring coefficients"
        A[:, k] = c_sub[:s] + 1j * c_sub[s:]
    # --- StC matrices: packed coeffs u -> slot values z
    Mc1 = np.zeros((s, s), dtype=np.complex128)
    Mc2 = np.zeros((s, s), dtype=np.complex128)
    for j in range(s):
        c = np.zeros(n)
        c[j * gap] = 1.0
        Mc1[:, j] = encoding.ckks_embed(c, n)[:s]
        c = np.zeros(n)
        c[(j + s) * gap] = 1.0
        Mc2[:, j] = encoding.ckks_embed(c, n)[:s]
    D = (Mc1 - 1j * Mc2) / 2.0
    assert np.max(np.abs(Mc1 + 1j * Mc2)) < 1e-9 * np.max(np.abs(Mc1))
    return A, D


def setup(ctx: CKKSContext, slots: int, K: int = 16, r: int = 5,
          cheb_deg: int = 28,
          level_budget: tuple = (1, 1)) -> BootstrapPrecomp:
    """(role of EvalBootstrapSetup: builds linear-transform constants and
    the sine approximation; level_budget=(enc, dec) > 1 selects the
    collapsed-FFT CtS/StC factors, ckksrns-fhe.cpp:108-133.)"""
    n = ctx.n
    s = slots
    assert s <= n // 4 and n % (2 * s) == 0
    A, D = stc_matrices(n, s)

    a_dom = (K + 1) / float(1 << r)
    cheb = adv.chebyshev_coefficients(
        lambda u: np.cos(2.0 * np.pi * u), -a_dom, a_dom, cheb_deg)
    level_budget = tuple(level_budget)
    cts = stc = None
    if level_budget != (1, 1):
        cts = cfft.cts_factors(s, level_budget[0])
        # the q0/(2 pi sigma) recovery factor is applied at eval time
        stc = cfft.stc_factors(s, level_budget[1])
    return BootstrapPrecomp(s, K, r, cheb, A / 2.0, D,
                            level_budget, cts, stc)


def keygen(ctx: CKKSContext, sk, pre: BootstrapPrecomp,
           rng: np.random.Generator) -> BootstrapKeys:
    """(role of EvalBootstrapKeyGen: relin + conj + the LT rotations —
    BSGS baby/giant set for the dense path, the collapsed factors'
    diagonal offsets for the staged path.)"""
    evk = ckks.relin_keygen(ctx, sk, rng)
    conj = ckks.conj_keygen(ctx, sk, rng)
    if pre.staged:
        idx = cfft.factors_rotations(pre.cts + pre.stc)
    else:
        idx = lt_rotation_indices(pre.slots)
    idx = sorted(set(idx) | set(partial_sum_rotations(ctx.n, pre.slots)))
    rots = ckks.rot_keygen(ctx, sk, idx, rng)
    return BootstrapKeys(evk, conj, rots)


def mod_raise(ctx: CKKSContext, ct: Ciphertext) -> Ciphertext:
    """Centered lift from the 1-tower basis to the full chain; the scale is
    reinterpreted as q0 (slot readings become x/q0).
    (role of the ModRaise/AdjustCiphertext step, ckksrns-fhe.cpp:238+)."""
    assert ct.towers == 1, "level-reduce to one tower before bootstrapping"
    q0 = ctx.q_moduli[0]
    full = ctx.basis()
    fn = _mod_raise_fn(ctx)
    polys = tuple(dcrt.make_poly(full, fn(p.data), Format.EVAL)
                  for p in ct.polys)
    return Ciphertext(polys, float(q0))


@lru_cache(maxsize=None)
def _mod_raise_fn(ctx: CKKSContext):
    import jax

    q0 = ctx.q_moduli[0]
    full_moduli = ctx.q_moduli
    old_mod = make_mod_consts((q0,), trailing_dims=1)
    new_mod = make_mod_consts(full_moduli, trailing_dims=1)
    one_plan = ntt_ops.make_plan(ctx.n, (q0,))
    full_plan = ntt_ops.make_plan(ctx.n, full_moduli)

    @jax.jit
    def fn(x: U64) -> U64:
        coeff = ntt_ops.inverse(one_plan, x)          # [1, n]
        lifted = switch_modulus(coeff, old_mod, new_mod)  # [L, n] centered
        return ntt_ops.forward(full_plan, lifted)

    return fn


def partial_sum_rotations(n: int, s: int):
    """Rotation indices of the sparse-packing partial-sums fold after
    ModRaise (reference: EvalBootstrap sparse branch,
    ``ckksrns-fhe.cpp:530-532``): j*s for j = 1, 2, 4, ... < n/(2s)."""
    out = []
    j = 1
    while j < n // (2 * s):
        out.append(j * s)
        j <<= 1
    return out


def partial_sums_fold(ctx: CKKSContext, keys: BootstrapKeys,
                      raised: Ciphertext, s: int) -> Ciphertext:
    """Project the raised ciphertext onto the subring fixed by
    rotation-by-s: raised <- sum_{j=0}^{P-1} rot(raised, j*s), P = n/(2s),
    via log2(P) doubling steps (each step rotates the running sum).

    Every monomial X^t with t a multiple of gap = n/(2s) is FIXED by the
    generator sigma: X -> X^{5^s} (v2(5^s - 1) = log2(4s) exactly), so the
    fold maps x -> P * (restriction of x to the subring) and annihilates
    every off-subring component — in particular the coefficients of the
    mod-raise overflow I at non-gap positions, whose aliasing into the
    slot-periodic CtS transform is what broke bootstrap at large n/(2s)
    (E2E_SCALE.md phase B history). The xP amplification is removed for
    free by reinterpreting the scale (slot readings become x/(P*q0)).
    """
    gap = ctx.n // (2 * s)
    if gap <= 1:
        return raised
    for rot in partial_sum_rotations(ctx.n, s):
        raised = ckks.eval_add(
            raised, ckks.eval_rotate(raised, rot, keys.rot[rot]))
    return Ciphertext(raised.polys, raised.scale * gap)


def _bsgs_split(s: int):
    """Baby/giant split with B*G >= s, B ~ sqrt(s)."""
    B = 1 << ((s.bit_length()) // 2)
    G = -(-s // B)
    return B, G


def lt_rotation_indices(s: int):
    """Rotation keys needed by the BSGS linear transform of size s."""
    B, G = _bsgs_split(s)
    return sorted(set(range(1, B)) | {g * B for g in range(1, G)})


def _linear_transform(ctx: CKKSContext, ct: Ciphertext, mat: np.ndarray,
                      keys: BootstrapKeys) -> Ciphertext:
    """sum_j diag_j(mat) ⊙ rot_j(ct) via baby-step/giant-step: ~2*sqrt(s)
    keyswitches instead of s (role of EvalLinearTransform /
    EvalCoeffsToSlots inner loop; the reference's BSGS decomposition).
    Giant-step diagonals are pre-rotated on the host (free), so only
    B-1 baby + G-1 giant ciphertext rotations touch the device; the baby
    rotations share ONE hoisted digit decomposition (reference:
    EvalFastRotationPrecompute amortization)."""
    s = mat.shape[0]
    n_half = ctx.params.num_slots
    reps = n_half // s
    B, G = _bsgs_split(s)
    baby = {0: ct}
    if B > 1:
        digits = ckks.fast_rotation_precompute(ct, keys.rot[1])
        for b in range(1, B):
            baby[b] = ckks.eval_fast_rotate(ct, b, keys.rot[b], digits)
    acc = None
    for g in range(G):
        y = None
        for b in range(B):
            j = g * B + b
            if j >= s:
                break
            diag = np.array([mat[i, (i + j) % s] for i in range(s)])
            # pre-rotate by g*B so the giant rotation lands it at diag_j
            d = np.roll(np.tile(diag, reps), g * B)
            pt = ckks.encode(ctx, d, towers=ct.towers,
                             scale=adv.scale_at(ctx, 0))
            term = Ciphertext(tuple(dcrt.mul(p, pt) for p in baby[b].polys),
                              baby[b].scale * adv.scale_at(ctx, 0))
            y = term if y is None else ckks.eval_add(y, term)
        if g > 0:
            y = ckks.eval_rotate(y, g * B, keys.rot[g * B])
        acc = y if acc is None else ckks.eval_add(acc, y)
    return ckks.rescale(acc)


def _lt_diags(ctx: CKKSContext, ct: Ciphertext, diags, keys: BootstrapKeys,
              fold: complex = 1.0) -> Ciphertext:
    """One collapsed-FFT factor: sum_r diag_r ⊙ rot_r(ct), then rescale.
    The factor's diagonal count is small (<= 2^(layers+1)-1), so rotations
    are applied directly (no BSGS) — each offset has its own key, and all
    offsets share ONE hoisted digit decomposition of ct (reference:
    EvalFastRotationPrecompute amortization)."""
    s = len(next(iter(diags.values())))
    reps = ctx.params.num_slots // s
    pt_scale = adv.scale_at(ctx, 0)
    offs = sorted(diags)
    digits = None
    if any(r != 0 for r in offs):
        digits = ckks.fast_rotation_precompute(
            ct, keys.rot[next(r for r in offs if r != 0)])
    acc = None
    for r in offs:
        d = np.tile(diags[r] * fold, reps)
        pt = ckks.encode(ctx, d, towers=ct.towers, scale=pt_scale)
        rct = ct if r == 0 else ckks.eval_fast_rotate(ct, r, keys.rot[r],
                                                      digits)
        term = Ciphertext(tuple(dcrt.mul(p, pt) for p in rct.polys),
                          rct.scale * pt_scale)
        acc = term if acc is None else ckks.eval_add(acc, term)
    return ckks.rescale(acc)


def _lt_factors(ctx: CKKSContext, ct: Ciphertext, factors, keys,
                fold: complex = 1.0) -> Ciphertext:
    """Apply collapsed-FFT factors in application order (one level each);
    ``fold`` is multiplied into the last factor's constants."""
    for i, f in enumerate(factors):
        ct = _lt_diags(ctx, ct, f, keys,
                       fold if i == len(factors) - 1 else 1.0)
    return ct


def _mult_i(ctx: CKKSContext, ct: Ciphertext, sign: int = 1) -> Ciphertext:
    """Exact multiply by the imaginary unit: i <-> X^{n/2} (every slot
    exponent is 5^j ≡ 1 mod 4, so the monomial reads as +i in all slots).
    No scale change, no extra noise."""
    n = ctx.n
    rows = [0] * n
    rows[n // 2] = sign  # poly X^{n/2} (or -X^{n/2})
    basis = ctx.basis(ct.towers)
    from ..utils import sampling as smp
    pt = dcrt.to_eval(dcrt.from_int_rows(
        basis, smp.signed_to_rns_rows(rows, basis.moduli), Format.COEFF))
    return Ciphertext(tuple(dcrt.mul(p, pt) for p in ct.polys), ct.scale)


def eval_bootstrap(ctx: CKKSContext, keys: BootstrapKeys,
                   pre: BootstrapPrecomp, ct: Ciphertext) -> Ciphertext:
    """(role of FHECKKSRNS::EvalBootstrap, ckksrns-fhe.cpp:238)."""
    q0 = ctx.q_moduli[0]
    sigma_in = ct.scale
    s = pre.slots

    # 1. ModRaise (slots now read x/q0 — meaningless until CtS), then the
    # sparse-packing partial-sums fold: kills the off-subring overflow
    # components whose aliasing broke the slot transform at large n/(2s).
    raised = mod_raise(ctx, ct)
    raised = partial_sums_fold(ctx, keys, raised, s)

    # 2. CoeffsToSlots: v' = LT_{A/2}(raised); split real/imag coefficient
    # halves via conjugation. Staged: DIF factors, slots exit bit-reversed
    # (the pointwise steps below don't care; StC consumes that order).
    if pre.staged:
        v = _lt_factors(ctx, raised, pre.cts, keys)
    else:
        v = _linear_transform(ctx, raised, pre.A_half, keys)
    v_conj = ckks.eval_conjugate(v, keys.conj)
    y_re = ckks.eval_add(v, v_conj)
    y_im = _mult_i(ctx, ckks.eval_sub(v_conj, v), 1)

    # 3. EvalSine on both branches: y -> sin(2*pi*y), y in +-(K+1)
    def eval_sine(y: Ciphertext) -> Ciphertext:
        # shift by -1/4 so double-angle of cos ends at sin: evaluate
        # f = cos(2*pi*u), u = (y - 1/4)/2^r  via Chebyshev on +-a_dom.
        # The division by 2^r is a free scale reinterpretation.
        shift = Ciphertext(y.polys, y.scale * (1 << pre.r))
        shift = adv.add_const(ctx, shift, -0.25 / (1 << pre.r))
        a_dom = (pre.K + 1) / float(1 << pre.r)
        f = adv.eval_chebyshev(ctx, shift, pre.cheb_coeffs, -a_dom, a_dom,
                               keys.evk)
        for _ in range(pre.r):
            sq = adv.square_auto(ctx, f, keys.evk)
            two = adv.mult_const(ctx, sq, 2.0, 1.0)
            f = adv.add_const(ctx, two, -1.0)
        return f

    s_re = eval_sine(y_re)
    s_im = eval_sine(y_im)

    # 4. recombine u'' = s_re + i*s_im, then StC with q0/(2*pi*sigma) folded
    k = max(adv.depth_of(ctx, s_re), adv.depth_of(ctx, s_im))
    s_re = adv.adjust_depth(ctx, s_re, k)
    s_im = adv.adjust_depth(ctx, s_im, k)
    u = ckks.eval_add(s_re, _mult_i(ctx, s_im, 1))
    factor = q0 / (2.0 * np.pi * sigma_in)
    # slots of the output read the original message m directly (the
    # q0/(2*pi*sigma) recovery factor is folded into the StC diagonals;
    # the conjugate branch LT_E is identically zero — see stc_matrices)
    if pre.staged:
        return _lt_factors(ctx, u, pre.stc, keys, fold=factor)
    return _linear_transform(ctx, u, pre.D * factor, keys)


# ---------------------------------------------------------------------------
# Iterative (multi-precision) bootstrapping
# (reference: FHECKKSRNS::EvalBootstrap with numIterations=2,
# ckksrns-fhe.cpp:238-310): bootstrap once, extract the bootstrapping
# error at 2^precision amplification, bootstrap the error, subtract —
# the final error shrinks by ~2^precision.
# ---------------------------------------------------------------------------


def _mult_by_int(ctx: CKKSContext, ct: Ciphertext, k: int) -> Ciphertext:
    """Exact integer multiply (reference: MultByIntegerInPlace) — values
    scale by k, the scale metadata is unchanged."""
    basis = ct.polys[0].basis
    consts = tuple(k % q for q in basis.moduli)
    return Ciphertext(tuple(dcrt.mul_tower_const(p, consts)
                            for p in ct.polys), ct.scale)


def _normalize_scale(ctx: CKKSContext, ct: Ciphertext,
                     target_scale: float) -> Ciphertext:
    """Bring ct to exactly target_scale with one mult-by-one + rescale."""
    T = ct.towers
    tau = target_scale * ctx.q_moduli[T - 1] / ct.scale
    out = ckks.rescale(adv.mult_const(ctx, ct, 1.0, tau))
    return Ciphertext(out.polys, target_scale)


def eval_bootstrap_iterative(ctx: CKKSContext, keys: BootstrapKeys,
                             pre: BootstrapPrecomp, ct: Ciphertext,
                             precision: int = 4) -> Ciphertext:
    """Two-iteration bootstrap: output error ~2^-precision of the single
    pass (reference: EvalBootstrap numIterations=2 flow)."""
    k = 1 << precision
    # pass 1
    ct1 = eval_bootstrap(ctx, keys, pre, ct)
    ct1 = _normalize_scale(ctx, ct1, ct.scale)
    ct1s = _mult_by_int(ctx, ct1, k)
    # the amplified bootstrap error: 2^prec * (boot(m) - m), at 1 tower
    down = ckks.level_reduce(ct1s, ct1s.towers - ct.towers)
    err = ckks.eval_sub(down, _mult_by_int(ctx, ct, k))
    # pass 2: bootstrap the error and cancel it
    err_boot = eval_bootstrap(ctx, keys, pre, err)
    err_boot = _normalize_scale(ctx, err_boot, ct.scale)
    towers = min(ct1s.towers, err_boot.towers)
    ct1s = ckks.level_reduce(ct1s, ct1s.towers - towers)
    err_boot = ckks.level_reduce(err_boot, err_boot.towers - towers)
    final = ckks.eval_sub(ct1s, err_boot)
    # divide the message by 2^precision via the scale metadata (exact)
    return Ciphertext(final.polys, final.scale * k)
