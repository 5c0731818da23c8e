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
    c0 = to_int_array(dcrt.to_coeff(poly_ct.polys[0]).data)[0] \
        .astype(np.int64)
    c1 = to_int_array(dcrt.to_coeff(poly_ct.polys[1]).data)[0] \
        .astype(np.int64)

    # 3. batched LWE extraction under the CKKS coefficient key at q0:
    #    a_j[i] = c1[pos-i] for i <= pos, else -c1[n+pos-i]  (negacyclic)
    pos = (np.arange(num_values, dtype=np.int64) * gap)[:, None]  # [k, 1]
    src = pos - np.arange(n, dtype=np.int64)[None, :]             # [k, n]
    wrapped = c1[src % n]
    a = np.where(src >= 0, wrapped, (q0 - wrapped) % q0)          # [k, n]
    b = c0[pos[:, 0]]                                             # [k]

    # 4. mod switch q0 -> q_sw (object ints: q0 * q_sw overflows int64),
    #    batched key switch N -> n_lwe, mod switch to the gate modulus
    q_sw = keys.q_sw
    pp = bctx.params
    q_out = pp.q
    B_ks, d_ks = pp.B_ks, pp.d_ks
    a1 = ((a.astype(object) * q_sw * 2 + q0) // (2 * q0) % q_sw) \
        .astype(np.int64)                                         # [k, n]
    b1 = ((b.astype(object) * q_sw * 2 + q0) // (2 * q0) % q_sw) \
        .astype(np.int64)                                         # [k]
    # key switch (reference: LWEEncryptionScheme::KeySwitch), batched
    digits = []
    rem = a1.copy()
    for _ in range(d_ks):
        digits.append(rem % B_ks)
        rem //= B_ks
    digits = np.stack(digits, axis=2)                             # [k, n, d]
    j_idx = np.arange(n)[None, :, None]
    d_idx = np.arange(d_ks)[None, None, :]
    sel_a = keys.lwe_ks_a[j_idx, d_idx, digits]                   # [k,n,d,nl]
    sel_b = keys.lwe_ks_b[j_idx, d_idx, digits]                   # [k,n,d]
    a_acc = sel_a.sum(axis=(1, 2)) % q_sw                         # [k, nl]
    b_acc = (b1 + sel_b.sum(axis=(1, 2))) % q_sw                  # [k]
    # final mod switch to the gate modulus
    a2 = ((a_acc * q_out * 2 + q_sw) // (2 * q_sw)) % q_out
    b2 = ((b_acc * q_out * 2 + q_sw) // (2 * q_sw)) % q_out
    return [LWECiphertext(a2[i], int(b2[i]), q_out)
            for i in range(num_values)]


# ---------------------------------------------------------------------------
# FHEW -> CKKS
# ---------------------------------------------------------------------------


def eval_fhew_to_ckks(ctx: CKKSContext, bctx: binfhe.BinFHEContext,
                      pre: SchemeSwitchPrecomp, keys: SchemeSwitchKeys,
                      cts: Sequence[LWECiphertext],
                      slot_map: np.ndarray | None = None) -> Ciphertext:
    """(role of EvalFHEWtoCKKS, ckksrns-schemeswitching.h:105). Packs the
    LWE ciphertexts' messages into CKKS slots. Gate encoding (p = 4,
    phase = m * q/4, m in {0, 1}): slot i of the result reads m_i.

    slot_map (optional, int [num_slots]) assigns ANY ciphertext index to
    ANY slot (-1 = leave zero); the diagonal method is position-generic,
    so e.g. a period-tiled layout costs nothing extra. Default: ct i in
    slot i."""
    n_lwe = bctx.params.n_lwe
    k = len(cts)
    assert k <= n_lwe, "pack at most n_lwe values per call"
    q = cts[0].modulus
    n_half = ctx.params.num_slots
    if slot_map is None:
        slot_map = np.full(n_half, -1, dtype=np.int64)
        slot_map[:k] = np.arange(k)
    live = slot_map >= 0
    p_idx = np.arange(n_half)

    A = np.stack([np.asarray(c.a, dtype=np.float64) for c in cts])  # [k, n]
    b = np.array([float(c.b) for c in cts])

    # t = b/q - (A/q) s via the diagonal method over ct_s: slot p of
    # rot(ct_s, d) holds s[(p + d) mod n_lwe], so weight w[p] picks the
    # matching coefficient of the ciphertext assigned to slot p
    acc = None
    for d in range(n_lwe):
        w = np.zeros(n_half)
        w[live] = -A[slot_map[live], (p_idx[live] + d) % n_lwe] / q
        if not np.any(w):
            continue
        rot = keys.ct_s if d == 0 else \
            ckks.eval_rotate(keys.ct_s, d, keys.rot_f2c[d])
        term = ckks.eval_mult_plain(ctx, rot, w)
        acc = term if acc is None else ckks.eval_add(acc, term)
    acc = ckks.rescale(acc)
    bvec = np.zeros(n_half)
    bvec[live] = b[slot_map[live]] / q
    t_ct = ckks.eval_add_plain(ctx, acc, bvec)

    # wrap-free message recovery: sin(2*pi*t) = m for the gate encoding
    return adv.eval_chebyshev(ctx, t_ct, pre.cheb_coeffs,
                              -pre.B, pre.B, keys.evk)


# ---------------------------------------------------------------------------
# Comparison / Min / Max via scheme switching (reference:
# EvalCompareSwitchPrecompute / EvalCompareSchemeSwitching /
# EvalMinSchemeSwitching / EvalMaxSchemeSwitching,
# ``ckksrns-schemeswitching.h:128-152``, ``.cpp:1758-2074``): compare
# approximate CKKS values exactly by switching their difference to FHEW,
# evaluating a sign LUT per value with one programmable bootstrap, and
# switching the (exact) sign bits back into CKKS slots.
# ---------------------------------------------------------------------------


def _sign_q4_lut(p: int) -> list:
    """Negacyclic sign LUT mapping Z_p messages to +-p/4 (so the FHEW->CKKS
    sine lands exactly on +-1): +p/4 for m in (0, p/2), -p/4 above."""
    return ([0] + [p // 4] * (p // 2 - 1)
            + [0] + [p - p // 4] * (p // 2 - 1))


def _eval_signs(ctx, bctx, pre, keys, bk, diff_ct, num_values: int,
                p_msg: int):
    """CKKS difference -> FHEW sign bits -> CKKS slots in {-1, +1}
    (+1 where diff > 0). The shared core of compare/min/max."""
    lwes = eval_ckks_to_fhew(ctx, bctx, pre, keys, diff_ct, num_values,
                             p_msg)
    lut = _sign_q4_lut(p_msg)
    signs = [binfhe.eval_func(bctx, bk, c, lut, p_msg) for c in lwes]
    return eval_fhew_to_ckks(ctx, bctx, pre, keys, signs)


def eval_compare_scheme_switching(ctx, bctx, pre, keys, bk,
                                  ct1: Ciphertext, ct2: Ciphertext,
                                  num_values: int, p_msg: int
                                  ) -> Ciphertext:
    """(role of EvalCompareSchemeSwitching, ckksrns-schemeswitching.cpp:
    1779-1823). Slot i of the result is ~1.0 where ct1_i < ct2_i, ~0.0
    where ct1_i > ct2_i (~0.5 at exact ties). The values must be integers
    bounded by p_msg/2 in magnitude (the LWE message space)."""
    diff = ckks.eval_sub(ct1, ct2)
    s = _eval_signs(ctx, bctx, pre, keys, bk, diff, num_values, p_msg)
    # (1 - s) / 2: +1 (ct1 > ct2) -> 0, -1 -> 1
    half = np.full(ctx.params.num_slots, 0.5)
    out = ckks.rescale(ckks.eval_mult_plain(ctx, s, -half))
    return ckks.eval_add_plain(ctx, out, half)


def _tile_full(ctx, block: np.ndarray) -> np.ndarray:
    """Tile a length-s block across all num_slots (the LT's period-s slot
    convention: every ciphertext entering eval_ckks_to_fhew must be
    s-periodic over the full slot vector)."""
    return np.tile(block, ctx.params.num_slots // len(block))


def extremum_rotation_indices(ctx, num_values: int) -> list:
    """Rotation key indices eval_min/max_scheme_switching consumes (just
    the positive pair strides — the tiled diagonal-method layout makes
    every mask periodic for free, so no expand rotations are needed)."""
    idx = set()
    m = 1
    while m < num_values:
        idx.add(num_values // (2 * m))
        m *= 2
    return sorted(idx)


def _eval_extremum(ctx, bctx, pre, keys, bk, evk, rot_keys, ct,
                   num_values: int, p_msg: int, minimum: bool):
    """Tournament reduction shared by Min/Max (reference EvalMin/Max
    SchemeSwitching, ckksrns-schemeswitching.cpp:1825-2074):
    log2(numValues) rounds of compare + masked select.

    ct must be s-periodic over the slots (the c2f LT convention). Unlike
    the reference's cSelect + rotate(1 - cSelect) + expand-rotation chain,
    the sign bits come back from FHEW already tiled (eval_fhew_to_ckks
    slot_map) and the select/complement split is one position-dependent
    plaintext affine — zero mask rotations per round. Returns
    (extremum ct, argext indicator, both s-periodic)."""
    from . import ckks_advanced as adv
    assert num_values & (num_values - 1) == 0, "numValues must be a power of 2"
    ns = ctx.params.num_slots
    p_idx = np.arange(ns)
    block0 = np.zeros(pre.slots)
    block0[:num_values] = 1.0
    ind = ckks.eval_mult_plain(ctx, _one_ct(ctx, keys),
                               _tile_full(ctx, block0))
    ind = ckks.rescale(ind)
    cur = ct
    m = 1
    while m < num_values:
        stride = num_values // (2 * m)
        diff = adv.sub_auto(ctx, cur,
                            ckks.eval_rotate(cur, stride, rot_keys[stride]))
        lwes = eval_ckks_to_fhew(ctx, bctx, pre, keys, diff, stride, p_msg)
        lut = _sign_q4_lut(p_msg)
        signs = [binfhe.eval_func(bctx, bk, c, lut, p_msg) for c in lwes]
        # tiled layout: slots p and p+stride of every 2*stride block carry
        # the SAME pair's sign (s = +1 where first > second)
        smap = (p_idx % (2 * stride)) % stride
        s = eval_fhew_to_ckks(ctx, bctx, pre, keys, signs, slot_map=smap)
        # position-dependent affine (1 -+ s)/2: keep-first mask on the
        # first half of each pair block, its complement on the second
        first_half = (p_idx % (2 * stride)) < stride
        sign = np.where(first_half, -0.5, 0.5)
        if not minimum:
            sign = -sign
        sel = ckks.eval_add_plain(
            ctx, ckks.rescale(ckks.eval_mult_plain(ctx, s, sign)),
            np.full(ns, 0.5))
        cur = adv.mult_auto(ctx, cur, sel, evk)
        cur = adv.add_auto(ctx, cur,
                           ckks.eval_rotate(cur, stride, rot_keys[stride]))
        ind = adv.mult_auto(ctx, ind, sel, evk)
        m *= 2
    return cur, ind


def _one_ct(ctx, keys):
    """An encryption of all-ones without needing a public key here:
    keys.ct_s * 0 + 1 (a valid ciphertext whose message is 1)."""
    zero = ckks.eval_mult_plain(ctx, keys.ct_s,
                                np.zeros(ctx.params.num_slots))
    zero = ckks.rescale(zero)
    return ckks.eval_add_plain(ctx, zero, np.ones(ctx.params.num_slots))


def eval_min_scheme_switching(ctx, bctx, pre, keys, bk, evk, rot_keys,
                              ct: Ciphertext, num_values: int, p_msg: int):
    """(role of EvalMinSchemeSwitching, ckksrns-schemeswitching.cpp:
    1825-1907): returns (min ciphertext, one-hot argmin indicator)."""
    return _eval_extremum(ctx, bctx, pre, keys, bk, evk, rot_keys, ct,
                          num_values, p_msg, minimum=True)


def eval_max_scheme_switching(ctx, bctx, pre, keys, bk, evk, rot_keys,
                              ct: Ciphertext, num_values: int, p_msg: int):
    """(role of EvalMaxSchemeSwitching, ckksrns-schemeswitching.cpp:
    1990-2074): returns (max ciphertext, one-hot argmax indicator)."""
    return _eval_extremum(ctx, bctx, pre, keys, bk, evk, rot_keys, ct,
                          num_values, p_msg, minimum=False)


def _eval_extremum_alt(ctx, bctx, pre, keys, bk, evk, rot_keys, ct,
                       num_values: int, p_msg: int, minimum: bool):
    """The Alt tournament (reference EvalMin/MaxSchemeSwitchingAlt,
    ckksrns-schemeswitching.cpp:1909-1988, 2075-2150): instead of
    expanding the selection mask on the CKKS side, each round REPLICATES
    the FHEW sign ciphertexts host-side — the negated copy is the same
    LWE with b += q/2, which flips the +-1 sine decode — into a full
    num_values-long LWE vector, so the mask comes back from FHEW->CKKS
    already containing each pair's complement and one CONSTANT affine
    (1 -+ s)/2 finishes the select. Costs a wider FHEW->CKKS conversion
    per round; saves every mask-expansion structure."""
    from . import ckks_advanced as adv
    assert num_values & (num_values - 1) == 0, "numValues must be a power of 2"
    ns = ctx.params.num_slots
    p_idx = np.arange(ns)
    block0 = np.zeros(pre.slots)
    block0[:num_values] = 1.0
    ind = ckks.rescale(ckks.eval_mult_plain(ctx, _one_ct(ctx, keys),
                                            _tile_full(ctx, block0)))
    cur = ct
    m = 1
    while m < num_values:
        stride = num_values // (2 * m)
        diff = adv.sub_auto(ctx, cur,
                            ckks.eval_rotate(cur, stride, rot_keys[stride]))
        lwes = eval_ckks_to_fhew(ctx, bctx, pre, keys, diff, stride, p_msg)
        lut = _sign_q4_lut(p_msg)
        signs = [binfhe.eval_func(bctx, bk, c, lut, p_msg) for c in lwes]
        # replicate host-side: even blocks get the sign, odd blocks the
        # negated sign (b + q/2 flips the sine output)
        full: list = [None] * num_values
        for j, s_j in enumerate(signs):
            q = s_j.modulus
            neg = binfhe.LWECiphertext(s_j.a, (s_j.b + q // 2) % q, q)
            for i in range(2 * m):
                full[i * stride + j] = s_j if i % 2 == 0 else neg
        smap = p_idx % num_values
        s = eval_fhew_to_ckks(ctx, bctx, pre, keys, full, slot_map=smap)
        const = -0.5 if minimum else 0.5
        sel = ckks.eval_add_plain(
            ctx, ckks.rescale(ckks.eval_mult_plain(
                ctx, s, np.full(ns, const))),
            np.full(ns, 0.5))
        cur = adv.mult_auto(ctx, cur, sel, evk)
        cur = adv.add_auto(ctx, cur,
                           ckks.eval_rotate(cur, stride, rot_keys[stride]))
        ind = adv.mult_auto(ctx, ind, sel, evk)
        m *= 2
    return cur, ind


def eval_min_scheme_switching_alt(ctx, bctx, pre, keys, bk, evk, rot_keys,
                                  ct: Ciphertext, num_values: int,
                                  p_msg: int):
    """(role of EvalMinSchemeSwitchingAlt,
    ckksrns-schemeswitching.h:138)."""
    return _eval_extremum_alt(ctx, bctx, pre, keys, bk, evk, rot_keys, ct,
                              num_values, p_msg, minimum=True)


def eval_max_scheme_switching_alt(ctx, bctx, pre, keys, bk, evk, rot_keys,
                                  ct: Ciphertext, num_values: int,
                                  p_msg: int):
    """(role of EvalMaxSchemeSwitchingAlt,
    ckksrns-schemeswitching.h:148)."""
    return _eval_extremum_alt(ctx, bctx, pre, keys, bk, evk, rot_keys, ct,
                              num_values, p_msg, minimum=False)
