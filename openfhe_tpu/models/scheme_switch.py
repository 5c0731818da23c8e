"""CKKS <-> FHEW scheme switching.

Role of the reference's ``ckksrns-schemeswitching.{h,cpp}``
(``EvalCKKStoFHEWSetup/KeyGen/Precompute`` + ``EvalCKKStoFHEW`` and
``EvalFHEWtoCKKS``, header ``ckksrns-schemeswitching.h:64-115``): move
packed integer messages between the approximate CKKS domain (SIMD slots)
and the exact FHEW/TFHE domain (one LWE ciphertext per value), so that
non-polynomial functions can be bootstrapped per-value and the results
returned to the SIMD domain.

CKKS -> FHEW pipeline (per the reference's design):
  1. Homomorphic slots-to-coeffs: one slot-space linear transform (the
     bootstrap StC matrices) whose output polynomial carries the slot
     values in its coefficients, with a fold-in factor chosen so the
     coefficient scale is exactly q0/p.
  2. Drop to the last CKKS tower; extract one LWE sample per coefficient
     position under the CKKS secret-coefficient key (dimension N).
  3. LWE modulus switch q0 -> q_sw, LWE key switch N -> n_lwe (the binfhe
     keyswitch structure keyed by the CKKS secret), modulus switch to the
     FHEW gate modulus 2N_acc. Output phase: m * q/p.

FHEW -> CKKS pipeline:
  1. Homomorphically compute the LWE phases t_i = (b_i - <a_i, s>)/q via
     the diagonal method against a CKKS encryption of the FHEW key s
     (key material generated at keygen).
  2. t_i = m_i/p + K_i + eps with unknown integer wraps K_i; evaluate
     sin(2*pi*t) by Chebyshev so the wraps vanish; for the gate encoding
     p = 4, m in {0, 1}, the slot value IS the message.

TPU notes: the linear transforms and Chebyshev ride the existing jitted
CKKS primitives (rotations batch the keyswitch inner products); the
LWE-side switches are exact host integer code (they touch k*n scalars,
not device data).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import numpy as np

from .. import dcrt, keyswitch
from . import binfhe
from . import ckks
from . import ckks_advanced as adv
from . import ckks_bootstrap as boot
from .binfhe import LWECiphertext
from .ckks import Ciphertext, CKKSContext


@dataclasses.dataclass
class SchemeSwitchPrecomp:
    slots: int            # LT size s (power of two >= values per switch)
    D: np.ndarray         # StC matrix (ckks_bootstrap convention; conj branch is 0)
    B: int                # wrap bound for the FHEW->CKKS sine interval
    cheb_coeffs: np.ndarray


@dataclasses.dataclass
class SchemeSwitchKeys:
    conj: keyswitch.KSKey
    rot_stc: Dict[int, keyswitch.KSKey]      # rotations 1..s-1
    rot_f2c: Dict[int, keyswitch.KSKey]      # rotations 1..n_lwe-1
    evk: keyswitch.KSKey
    ct_s: Ciphertext                         # CKKS encryption of s_lwe
    lwe_ks_a: np.ndarray                     # [N, d, B, n] int64 (mod q_sw)
    lwe_ks_b: np.ndarray                     # [N, d, B] int64
    q_sw: int


def setup(ctx: CKKSContext, bctx: binfhe.BinFHEContext, slots: int,
          cheb_deg: int = 80) -> SchemeSwitchPrecomp:
    """(role of EvalCKKStoFHEWSetup / EvalSchemeSwitchingSetup)."""
    n = ctx.n
    s = slots
    assert s <= n // 4 and n % (2 * s) == 0
    n_lwe = bctx.params.n_lwe
    assert ctx.params.num_slots % n_lwe == 0, \
        "n_lwe must divide the CKKS slot count for the diagonal method"
    _, D = boot.stc_matrices(n, s)
    # Wrap bound for the phase t = b/q - <a/q, s> (a uniform, s ternary):
    # Var(<a/q, s>) ~ n_lwe/3 * Var(unif[0,1)) so 3*sqrt(n_lwe/3) is a
    # ~3-sigma bound and the +2 absorbs b/q and rounding. PROBABILISTIC:
    # a phase outside [-B, B] (per-slot prob ~ erfc(3/sqrt(2))/2 ~ 1.3e-3
    # under the Gaussian approximation of the Irwin-Hall sum) lands
    # outside the Chebyshev interval and that slot silently decodes to
    # garbage; the reference accepts the same trade (its interval is
    # heuristic too, ckksrns-schemeswitching.cpp). Raise cheb_deg and
    # widen k_sigma below for a lower failure rate.
    k_sigma = 3.0
    B = int(np.ceil(k_sigma * np.sqrt(n_lwe / 3.0))) + 2
    cheb = adv.chebyshev_coefficients(
        lambda u: np.sin(2.0 * np.pi * u), -B, B, cheb_deg)
    return SchemeSwitchPrecomp(s, D, B, cheb)


def keygen(ctx: CKKSContext, bctx: binfhe.BinFHEContext,
           pre: SchemeSwitchPrecomp, sk, sk_fhew: binfhe.BinFHESecret,
           pk, rng: np.random.Generator) -> SchemeSwitchKeys:
    """(role of EvalCKKStoFHEWKeyGen + EvalFHEWtoCKKSKeyGen): rotation /
    conjugation / relin keys, the N -> n LWE switching key derived from
    the CKKS secret coefficients, and a CKKS encryption of the FHEW key."""
    p = bctx.params
    n_lwe, q_sw = p.n_lwe, p.q_ks
    N = ctx.n
    conj = ckks.conj_keygen(ctx, sk, rng)
    rot_stc = ckks.rot_keygen(ctx, sk, boot.lt_rotation_indices(pre.slots),
                              rng)
    rot_f2c = ckks.rot_keygen(ctx, sk, range(1, n_lwe), rng)
    evk = ckks.relin_keygen(ctx, sk, rng)

    # CKKS encryption of s_lwe tiled across the slots (for FHEW->CKKS)
    reps = ctx.params.num_slots // n_lwe
    ct_s = ckks.encrypt(ctx, pk, np.tile(sk_fhew.s_lwe.astype(float), reps),
                        rng)

    # LWE switching key: encryptions of v * B_ks^d * sk_j under s_lwe at
    # q_sw (same structure as the binfhe keyswitch key, keyed by the CKKS
    # secret coefficients; reference: EvalCKKStoFHEWKeyGen's ksk)
    d_ks, B_ks = p.d_ks, p.B_ks
    z = sk.coeffs.astype(np.int64)            # [N] ternary
    a_ks = rng.integers(0, q_sw, size=(N, d_ks, B_ks, n_lwe), dtype=np.int64)
    e_ks = np.rint(rng.normal(0, p.sigma, size=(N, d_ks, B_ks))).astype(np.int64)
    vals = np.arange(B_ks, dtype=np.int64)[None, None, :]
    powers = np.array([pow(B_ks, d, q_sw) for d in range(d_ks)], np.int64)
    targets = (vals * powers[None, :, None] % q_sw
               * z[:, None, None]) % q_sw
    b_ks = (np.einsum("jdvn,n->jdv", a_ks, sk_fhew.s_lwe) + e_ks
            + targets) % q_sw
    return SchemeSwitchKeys(conj, rot_stc, rot_f2c, evk, ct_s,
                            a_ks, b_ks, q_sw)


# ---------------------------------------------------------------------------
# CKKS -> FHEW
# ---------------------------------------------------------------------------


def eval_ckks_to_fhew(ctx: CKKSContext, bctx: binfhe.BinFHEContext,
                      pre: SchemeSwitchPrecomp, keys: SchemeSwitchKeys,
                      ct: Ciphertext, num_values: int, p_msg: int
                      ) -> List[LWECiphertext]:
    """(role of EvalCKKStoFHEW, ckksrns-schemeswitching.h:83). ``ct`` must
    carry the integer messages in its first ``num_values`` slots, tiled
    with period ``pre.slots`` (the LT convention). Returns LWE ciphertexts
    under the FHEW key at modulus q = 2*N_acc with phase m * q/p_msg."""
    assert num_values <= pre.slots
    q0 = ctx.q_moduli[0]
    n = ctx.n
    s = pre.slots
    gap = n // (2 * s)

    # 1. slots-to-coeffs with the q0/p coefficient scale folded in
    delta1 = ct.scale * adv.scale_at(ctx, 0) / ctx.q_moduli[ct.towers - 1]
    factor = q0 / (p_msg * delta1)
    bkeys = boot.BootstrapKeys(keys.evk, keys.conj, keys.rot_stc)
    # the conjugate branch LT_E is identically zero (see stc_matrices)
    poly_ct = boot._linear_transform(ctx, ct, pre.D * factor, bkeys)

    # 2. drop to the last tower and read the coefficient arrays
    poly_ct = ckks.level_reduce(poly_ct, poly_ct.towers - 1)
    from ..ops.limb import to_int_array
    c0 = [int(v) for v in
          to_int_array(dcrt.to_coeff(poly_ct.polys[0]).data)[0]]
    c1 = [int(v) for v in
          to_int_array(dcrt.to_coeff(poly_ct.polys[1]).data)[0]]

    # 3. extract LWE samples under the CKKS coefficient key at q0
    out = []
    for j in range(num_values):
        pos = j * gap
        b_j = c0[pos]
        a_j = [0] * n
        for i in range(n):
            if i <= pos:
                a_j[i] = c1[pos - i]
            else:
                a_j[i] = (q0 - c1[n + pos - i]) % q0
        out.append((a_j, b_j))

    # 4. mod switch q0 -> q_sw (exact python ints), key switch N -> n_lwe,
    #    mod switch to the FHEW gate modulus
    q_sw = keys.q_sw
    pp = bctx.params
    q_out = pp.q
    B_ks, d_ks = pp.B_ks, pp.d_ks
    res = []
    for a_j, b_j in out:
        a1 = np.array([(ai * q_sw * 2 + q0) // (2 * q0) % q_sw
                       for ai in a_j], dtype=np.int64)
        b1 = (b_j * q_sw * 2 + q0) // (2 * q0) % q_sw
        # key switch (reference: LWEEncryptionScheme::KeySwitch)
        a_acc = np.zeros(pp.n_lwe, dtype=np.int64)
        b_acc = b1
        rem = a1.copy()
        for d in range(d_ks):
            dig = rem % B_ks
            rem //= B_ks
            a_acc = (a_acc + keys.lwe_ks_a[np.arange(len(a1)), d, dig]
                     .sum(axis=0)) % q_sw
            b_acc = (b_acc + int(keys.lwe_ks_b[np.arange(len(a1)), d, dig]
                                 .sum())) % q_sw
        # final mod switch to the gate modulus
        a2 = ((a_acc * q_out * 2 + q_sw) // (2 * q_sw)) % q_out
        b2 = ((b_acc * q_out * 2 + q_sw) // (2 * q_sw)) % q_out
        res.append(LWECiphertext(a2, int(b2), q_out))
    return res


# ---------------------------------------------------------------------------
# FHEW -> CKKS
# ---------------------------------------------------------------------------


def eval_fhew_to_ckks(ctx: CKKSContext, bctx: binfhe.BinFHEContext,
                      pre: SchemeSwitchPrecomp, keys: SchemeSwitchKeys,
                      cts: Sequence[LWECiphertext]) -> Ciphertext:
    """(role of EvalFHEWtoCKKS, ckksrns-schemeswitching.h:105). Packs the
    LWE ciphertexts' messages into CKKS slots. Gate encoding (p = 4,
    phase = m * q/4, m in {0, 1}): slot i of the result reads m_i."""
    n_lwe = bctx.params.n_lwe
    k = len(cts)
    assert k <= n_lwe, "pack at most n_lwe values per call"
    q = cts[0].modulus
    n_half = ctx.params.num_slots

    A = np.stack([np.asarray(c.a, dtype=np.float64) for c in cts])  # [k, n]
    b = np.array([float(c.b) for c in cts])

    # t = b/q - (A/q) s via the diagonal method over ct_s
    acc = None
    for d in range(n_lwe):
        w = np.zeros(n_half)
        for t in range(k):
            w[t] = -A[t, (t + d) % n_lwe] / q
        if not np.any(w):
            continue
        rot = keys.ct_s if d == 0 else \
            ckks.eval_rotate(keys.ct_s, d, keys.rot_f2c[d])
        term = ckks.eval_mult_plain(ctx, rot, w)
        acc = term if acc is None else ckks.eval_add(acc, term)
    acc = ckks.rescale(acc)
    bvec = np.zeros(n_half)
    bvec[:k] = b / q
    t_ct = ckks.eval_add_plain(ctx, acc, bvec)

    # wrap-free message recovery: sin(2*pi*t) = m for the gate encoding
    return adv.eval_chebyshev(ctx, t_ct, pre.cheb_coeffs,
                              -pre.B, pre.B, keys.evk)
