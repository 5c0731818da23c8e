"""Threshold (multiparty) FHE: additively shared secrets, round-robin joint
public key, and distributed decryption — scheme-generic over CKKS, BGV and
BFV, like the reference's Element-generic Multiparty capability.

Role of the reference's Multiparty capability
(``pke/lib/schemebase/base-multiparty.cpp:47`` — the base class is
Element-generic and serves all three RNS schemes; examples
threshold-fhe.cpp, threshold-fhe-5p.cpp):

* ``keygen_lead`` / ``keygen_join``: party 1 samples (b1 = -a s1 + e1, a);
  each subsequent party folds in its own share: b_i = b_{i-1} - a s_i + e_i.
  The joint public key encrypts under s = sum_i s_i while no party ever
  sees another's share. BGV scales every multiparty noise term by t (the
  reference's NoiseScale), keeping phases == m mod t.
* ``decrypt_lead`` / ``decrypt_main`` / ``combine``: the lead computes
  c0 + c1 s_1 (+ flooding noise), every other party contributes c1 s_i;
  the sum is the plaintext phase under the joint secret. ``combine``
  finishes with the scheme's own decode (CKKS canonical embedding, BGV
  mod-t, BFV scale-and-round by t/Q).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .. import dcrt
from ..dcrt import Format, RnsPoly
from ..utils import sampling
from . import ckks
from .ckks import Ciphertext, CKKSContext, PublicKey, SecretKey


def _scheme(ctx):
    """(module, name) for a context of any of the three RNS schemes."""
    from . import bfv, bgv
    if isinstance(ctx, CKKSContext):
        return ckks, "ckks"
    if isinstance(ctx, bgv.BGVContext):
        return bgv, "bgv"
    if isinstance(ctx, bfv.BFVContext):
        return bfv, "bfv"
    raise TypeError(f"unsupported context type {type(ctx).__name__}")


def _noise_scale(ctx) -> int:
    """BGV pre-scales every noise term by t (reference: GetNoiseScale);
    BFV/CKKS use unscaled noise."""
    return ctx.t if _scheme(ctx)[1] == "bgv" else 1


def _error_poly(ctx, basis, rng) -> RnsPoly:
    coeffs = (sampling.gaussian_coeffs(ctx.n, rng, ctx.params.sigma)
              * _noise_scale(ctx))
    rows = sampling.signed_to_rns_rows(coeffs, basis.moduli)
    return dcrt.to_eval(dcrt.from_int_rows(basis, rows, Format.COEFF))


def keygen_lead(ctx, rng: np.random.Generator):
    """Party 1: fresh share + initial joint public key (any scheme)."""
    module, _ = _scheme(ctx)
    pk, sk = module.keygen(ctx, rng)
    return pk, sk


def keygen_join(ctx, pk_prev: PublicKey, rng: np.random.Generator):
    """Party i >= 2: add own share s_i into the joint public key
    (reference: MultipartyKeyGen with a prior public key)."""
    basis = ctx.basis()
    hw = getattr(ctx.params, "secret_hw", 0)
    coeffs = sampling.sparse_ternary_coeffs(ctx.n, hw, rng) if hw else \
        sampling.ternary_coeffs(ctx.n, rng)
    sk_i = SecretKey(coeffs)
    s_i = sk_i.poly(basis)
    e = _error_poly(ctx, basis, rng)
    b = dcrt.add(dcrt.sub(e, dcrt.mul(pk_prev.a, s_i)), pk_prev.b)
    return PublicKey(b, pk_prev.a), sk_i


def joint_secret(ctx, shares: Sequence[SecretKey]) -> SecretKey:
    """Host-side sum of shares (FOR TESTS ONLY — never exists in a real
    deployment)."""
    total = np.sum([s.coeffs for s in shares], axis=0)
    return SecretKey(total)


def decrypt_lead(ctx, sk_share: SecretKey, ct,
                 rng: np.random.Generator,
                 flood_bits: int = 20) -> RnsPoly:
    """Lead partial decryption: c0 + c1 s_1 + e_smudge
    (reference: MultipartyDecryptLead, noise flooding for share privacy;
    the smudge is t-scaled for BGV so it vanishes mod t)."""
    assert len(ct.polys) == 2
    basis = ct.basis
    s = sk_share.poly(basis)
    part = dcrt.add(ct.polys[0], dcrt.mul(ct.polys[1], s))
    return dcrt.add(part, _flood_noise(ctx, basis, rng, flood_bits))


def decrypt_main(ctx, sk_share: SecretKey, ct,
                 rng: np.random.Generator,
                 flood_bits: int = 20) -> RnsPoly:
    """Non-lead partial decryption: c1 s_i + e_smudge
    (reference: MultipartyDecryptMain)."""
    basis = ct.basis
    s = sk_share.poly(basis)
    part = dcrt.mul(ct.polys[1], s)
    return dcrt.add(part, _flood_noise(ctx, basis, rng, flood_bits))


def _flood_noise(ctx, basis, rng, flood_bits: int) -> RnsPoly:
    mags = rng.integers(-(1 << flood_bits), 1 << flood_bits, size=ctx.n)
    rows = sampling.signed_to_rns_rows(mags * _noise_scale(ctx),
                                       basis.moduli)
    return dcrt.to_eval(dcrt.from_int_rows(basis, rows, Format.COEFF))


def combine(ctx, ct, partials: List[RnsPoly],
            num_slots: int | None = None):
    """Fuse partial decryptions into plaintext slots
    (reference: MultipartyDecryptFusion), finishing with the scheme's
    decode."""
    from .. import encoding
    acc = partials[0]
    for p in partials[1:]:
        acc = dcrt.add(acc, p)
    module, name = _scheme(ctx)
    m_coeff = dcrt.to_coeff(acc)
    if name == "bfv":
        from ..ops.limb import to_int_array
        scaled = module._decrypt_scale(ctx.t, ct.basis.moduli)(m_coeff.data)
        vals = [int(v) for v in to_int_array(scaled)[0]]
        slots = encoding.packed_decode(vals, ctx.n, ctx.t)
        return slots[:num_slots] if num_slots else slots
    rows = dcrt.to_int_rows(m_coeff)
    coeffs = ckks.crt_interpolate_centered(rows, ct.basis.moduli)
    if name == "bgv":
        slots = encoding.packed_decode([c % ctx.t for c in coeffs],
                                       ctx.n, ctx.t)
        return slots[:num_slots] if num_slots else slots
    return encoding.ckks_decode(coeffs, ctx.n, ct.scale, num_slots)


# ---------------------------------------------------------------------------
# Interactive joint evaluation keys (reference: threshold-fhe.cpp rounds;
# base-multiparty.cpp MultiKeySwitchGen / MultiAddEvalKeys /
# MultiMultEvalKey / MultiAddEvalMultKeys / MultiEvalAutomorphismKeyGen)
# ---------------------------------------------------------------------------

from .. import keyswitch  # noqa: E402


def _share_poly_qp(ctx, sk_i: SecretKey) -> RnsPoly:
    return sk_i.poly(ctx.full_qp_basis)


def evalmult_round1(ctx, sk_i: SecretKey,
                    rng: np.random.Generator,
                    prev_key: keyswitch.KSKey | None = None
                    ) -> keyswitch.KSKey:
    """Party i's round-1 share: keyswitch key (s_i -> s_i) under common
    randomness a (fresh for the lead, reused from the previous party
    otherwise). Reference: KeySwitchGen + MultiKeySwitchGen."""
    s_i = _share_poly_qp(ctx, sk_i)
    if prev_key is None:
        return keyswitch.keygen(ctx.ks_params, s_i, s_i, rng,
                                ctx.params.sigma,
                                error_scale=_noise_scale(ctx))
    return keyswitch.keygen_with_a(ctx.ks_params, s_i, s_i,
                                   keyswitch.key_a_datas(prev_key), rng,
                                   ctx.params.sigma,
                                   error_scale=_noise_scale(ctx))


def evalmult_accumulate_round1(shares: Sequence[keyswitch.KSKey]
                               ) -> keyswitch.KSKey:
    """Sum the b components: joint key encrypting s under s
    (reference: MultiAddEvalKeys)."""
    acc = shares[0]
    for k in shares[1:]:
        acc = keyswitch.add_keys_b(acc, k)
    return acc


def evalmult_round2(ctx, sk_i: SecretKey,
                    joint_ab: keyswitch.KSKey,
                    rng: np.random.Generator) -> keyswitch.KSKey:
    """Party i's round-2 share: s_i * joint_ab (+ fresh noise)
    (reference: MultiMultEvalKey)."""
    return keyswitch.scale_key_by_share(joint_ab, _share_poly_qp(ctx, sk_i),
                                        rng, ctx.params.sigma,
                                        error_scale=_noise_scale(ctx))


def evalmult_finalize(shares: Sequence[keyswitch.KSKey]) -> keyswitch.KSKey:
    """Sum the round-2 shares into the joint relinearization key for
    s^2 -> s (reference: MultiAddEvalMultKeys)."""
    acc = shares[0]
    for k in shares[1:]:
        acc = keyswitch.add_keys_full(acc, k)
    return acc


def rot_keygen_share(ctx, sk_i: SecretKey, rot: int,
                     rng: np.random.Generator,
                     prev_key: keyswitch.KSKey | None = None
                     ) -> keyswitch.KSKey:
    """Party i's share of a joint rotation key: b_i = -a s_i + e +
    f * sigma_k(s_i); summing shares yields the joint automorphism key in
    ONE round (reference: MultiEvalAutomorphismKeyGen)."""
    qp = ctx.full_qp_basis
    s_i = sk_i.poly(qp)
    module, name = _scheme(ctx)
    k = ckks.rotation_indices_to_galois(ctx.n, rot) if name == "ckks" \
        else module.rotation_galois(ctx.n, rot)
    s_rot = dcrt.automorphism(s_i, k)
    if prev_key is None:
        return keyswitch.keygen(ctx.ks_params, s_i, s_rot, rng,
                                ctx.params.sigma,
                                error_scale=_noise_scale(ctx))
    return keyswitch.keygen_with_a(ctx.ks_params, s_i, s_rot,
                                   keyswitch.key_a_datas(prev_key), rng,
                                   ctx.params.sigma,
                                   error_scale=_noise_scale(ctx))


def rot_keygen_finalize(shares: Sequence[keyswitch.KSKey]
                        ) -> keyswitch.KSKey:
    acc = shares[0]
    for k in shares[1:]:
        acc = keyswitch.add_keys_b(acc, k)
    return acc


# ---------------------------------------------------------------------------
# Interactive multiparty bootstrapping (threshold CKKS).
# Reference: MultipartyCKKSRNS::IntMPBootAdjustScale / RandomElementGen /
# Decrypt / Add / Encrypt (ckksrns-multiparty.cpp:118-460; facade
# cryptocontext.h:3111-3157; examples tckks-interactive-mp-bootstrapping*).
#
# One round: every party masks its partial decryption of the compressed
# ciphertext with a fresh flood mask M_i (uniform over the first
# `mask_towers` moduli) and simultaneously re-encrypts +M_i at FULL level
# under common randomness a:
#     h0_i = s_i * c1          - M_i   (mod q', no noise)
#     h1_i = -s_i * a + e_i    + M_i   (mod Q)
# Aggregation + the lead's final step rebuild (c0 + h0 lifted to Q) + h1,
# giving a fresh full-level encryption of the same message: the masks
# cancel exactly because both shares expand the SAME integer mask value,
# and the lift of c0 + h0 = m~ - M is CENTERED (|m~ - M| << q'/2), unlike
# the reference's positive lift + implementation-defined wraparound.
# ---------------------------------------------------------------------------


from functools import lru_cache  # noqa: E402

from ..ops import rns  # noqa: E402
from ..ops.limb import U64, from_int_array  # noqa: E402
from ..ops.modular import add_mod, sub_mod, shoup_precon_int  # noqa: E402


def int_mp_boot_adjust_scale(ctx: CKKSContext, ct: Ciphertext,
                             mask_towers: int = 1) -> Ciphertext:
    """Compress the ciphertext to (message towers) + mask_towers before the
    interactive bootstrap (reference: IntMPBootAdjustScale,
    ckksrns-multiparty.cpp:118-161; FIXEDMANUAL branch = Compress)."""
    msg_towers = (ctx.params.scaling_mod_size //
                  ctx.params.first_mod_size + 1)
    keep = msg_towers + mask_towers
    assert ct.towers >= keep, "not enough towers left to bootstrap"
    return ckks.level_reduce(ct, ct.towers - keep)


def int_mp_boot_random_element_gen(ctx: CKKSContext,
                                   rng: np.random.Generator) -> RnsPoly:
    """Common random polynomial over the FULL chain (EVAL) — the shared
    `a` component of the output ciphertext (reference:
    IntMPBootRandomElementGen)."""
    basis = ctx.basis()
    return dcrt.from_int_rows(
        basis, sampling.uniform_rns_rows(ctx.n, basis.moduli, rng),
        Format.EVAL)


@lru_cache(maxsize=None)
def _half_consts(moduli: tuple, half: int):
    """[L, 1] residues of `half` for centered-lift shifting."""
    rows = [[half % q] for q in moduli]
    return from_int_array(np.asarray(rows, dtype=object))


def _expand_rows(x: U64, from_moduli: tuple, to_moduli: tuple) -> U64:
    """Exact positive lift of coefficient rows over `from_moduli` to the
    superset basis `to_moduli` (which has from_moduli as a prefix)."""
    k = len(from_moduli)
    assert tuple(to_moduli[:k]) == tuple(from_moduli)
    if k == len(to_moduli):
        return x
    import jax.numpy as jnp
    conv = rns.exact_switch_basis(x, from_moduli, tuple(to_moduli[k:]))
    return U64(jnp.concatenate([x.lo, conv.lo], axis=0),
               jnp.concatenate([x.hi, conv.hi], axis=0))


def int_mp_boot_decrypt(ctx: CKKSContext, sk_i: SecretKey, ct: Ciphertext,
                        a: RnsPoly, rng: np.random.Generator,
                        mask_towers: int = 1):
    """Party i's masked decryption + re-encryption share pair
    (reference: IntMPBootDecrypt -> GenerateMaskedDecryptionShare /
    GenerateReEncryptionShare, ckksrns-multiparty.cpp:305-390)."""
    small = ct.basis
    full = ctx.basis()
    t_moduli = small.moduli[:mask_towers]

    # fresh flood mask, uniform over R_t (coefficient values in [0, t))
    m_rows = sampling.uniform_rns_rows(ctx.n, t_moduli, rng)
    m = from_int_array(m_rows)
    m_small = dcrt.to_eval(dcrt.make_poly(
        small, _expand_rows(m, t_moduli, small.moduli), Format.COEFF))
    m_full = dcrt.to_eval(dcrt.make_poly(
        full, _expand_rows(m, t_moduli, full.moduli), Format.COEFF))

    # h0_i = s_i c1 - M_i over q' (no noise: reference IsZeroNoise=true)
    s_small = sk_i.poly(small)
    h0 = dcrt.sub(dcrt.mul(ct.polys[1], s_small), m_small)

    # h1_i = -s_i a + e_i + M_i over Q
    s_full = sk_i.poly(full)
    e_rows = sampling.signed_to_rns_rows(
        sampling.gaussian_coeffs(ctx.n, rng, ctx.params.sigma), full.moduli)
    e = dcrt.to_eval(dcrt.from_int_rows(full, e_rows, Format.COEFF))
    h1 = dcrt.add(dcrt.sub(e, dcrt.mul(a, s_full)), m_full)
    return h0, h1


def int_mp_boot_add(share_pairs):
    """Aggregate the parties' (h0_i, h1_i) pairs
    (reference: IntMPBootAdd)."""
    h0, h1 = share_pairs[0]
    for h0_i, h1_i in share_pairs[1:]:
        h0 = dcrt.add(h0, h0_i)
        h1 = dcrt.add(h1, h1_i)
    return h0, h1


def int_mp_boot_encrypt(ctx: CKKSContext, shares, a: RnsPoly,
                        ct: Ciphertext) -> Ciphertext:
    """Lead party's final step: lift c0 + h0 to the full chain (CENTERED
    exact CRT expansion) and add the aggregated re-encryption share
    (reference: IntMPBootEncrypt, ckksrns-multiparty.cpp:410-460).
    Output: fresh full-level (c0'', a) with the same message and scale."""
    h0, h1 = shares
    small = ct.basis
    full = ctx.basis()
    c0p = dcrt.add(ct.polys[0], h0)

    # centered exact lift q' -> Q: shift by q'/2, positive lift, unshift
    half = small.big_modulus // 2
    x = dcrt.to_coeff(c0p)
    shifted = add_mod(x.data, _half_consts(small.moduli, half),
                      small.mod.q)
    lifted = _expand_rows(shifted, small.moduli, full.moduli)
    unshifted = sub_mod(lifted, _half_consts(full.moduli, half),
                        full.mod.q)
    c0_full = dcrt.to_eval(dcrt.make_poly(full, unshifted, Format.COEFF))

    c0pp = dcrt.add(c0_full, h1)
    return Ciphertext((c0pp, a), ct.scale)
