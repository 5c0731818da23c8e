"""Threshold (multiparty) FHE: additively shared secrets, round-robin joint
public key, and distributed decryption.

Role of the reference's Multiparty capability
(``pke/lib/schemebase/base-multiparty.cpp``; examples threshold-fhe.cpp):

* ``keygen_lead`` / ``keygen_join``: party 1 samples (b1 = -a s1 + e1, a);
  each subsequent party folds in its own share: b_i = b_{i-1} - a s_i + e_i.
  The joint public key encrypts under s = sum_i s_i while no party ever
  sees another's share.
* ``decrypt_lead`` / ``decrypt_main`` / ``combine``: the lead computes
  c0 + c1 s_1 (+ flooding noise), every other party contributes c1 s_i;
  the sum is the plaintext phase under the joint secret.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .. import dcrt
from ..dcrt import Format, RnsPoly
from ..utils import sampling
from . import ckks
from .ckks import Ciphertext, CKKSContext, PublicKey, SecretKey


def keygen_lead(ctx: CKKSContext, rng: np.random.Generator):
    """Party 1: fresh share + initial joint public key."""
    pk, sk = ckks.keygen(ctx, rng)
    return pk, sk


def keygen_join(ctx: CKKSContext, pk_prev: PublicKey,
                rng: np.random.Generator):
    """Party i >= 2: add own share s_i into the joint public key
    (reference: MultipartyKeyGen with a prior public key)."""
    basis = ctx.basis()
    hw = ctx.params.secret_hw
    coeffs = sampling.sparse_ternary_coeffs(ctx.n, hw, rng) if hw else \
        sampling.ternary_coeffs(ctx.n, rng)
    sk_i = SecretKey(coeffs)
    s_i = sk_i.poly(basis)
    e_rows = sampling.signed_to_rns_rows(
        sampling.gaussian_coeffs(ctx.n, rng, ctx.params.sigma), basis.moduli)
    e = dcrt.to_eval(dcrt.from_int_rows(basis, e_rows, Format.COEFF))
    b = dcrt.add(dcrt.sub(e, dcrt.mul(pk_prev.a, s_i)), pk_prev.b)
    return PublicKey(b, pk_prev.a), sk_i


def joint_secret(ctx: CKKSContext, shares: Sequence[SecretKey]) -> SecretKey:
    """Host-side sum of shares (FOR TESTS ONLY — never exists in a real
    deployment)."""
    total = np.sum([s.coeffs for s in shares], axis=0)
    return SecretKey(total)


def decrypt_lead(ctx: CKKSContext, sk_share: SecretKey, ct: Ciphertext,
                 rng: np.random.Generator,
                 flood_bits: int = 20) -> RnsPoly:
    """Lead partial decryption: c0 + c1 s_1 + e_smudge
    (reference: MultipartyDecryptLead, noise flooding for share privacy)."""
    assert len(ct.polys) == 2
    basis = ct.basis
    s = sk_share.poly(basis)
    part = dcrt.add(ct.polys[0], dcrt.mul(ct.polys[1], s))
    return dcrt.add(part, _flood_noise(ctx, basis, rng, flood_bits))


def decrypt_main(ctx: CKKSContext, sk_share: SecretKey, ct: Ciphertext,
                 rng: np.random.Generator,
                 flood_bits: int = 20) -> RnsPoly:
    """Non-lead partial decryption: c1 s_i + e_smudge
    (reference: MultipartyDecryptMain)."""
    basis = ct.basis
    s = sk_share.poly(basis)
    part = dcrt.mul(ct.polys[1], s)
    return dcrt.add(part, _flood_noise(ctx, basis, rng, flood_bits))


def _flood_noise(ctx: CKKSContext, basis, rng, flood_bits: int) -> RnsPoly:
    mags = rng.integers(-(1 << flood_bits), 1 << flood_bits, size=ctx.n)
    rows = sampling.signed_to_rns_rows(mags, basis.moduli)
    return dcrt.to_eval(dcrt.from_int_rows(basis, rows, Format.COEFF))


def combine(ctx: CKKSContext, ct: Ciphertext, partials: List[RnsPoly],
            num_slots: int | None = None) -> np.ndarray:
    """Fuse partial decryptions into plaintext slots
    (reference: MultipartyDecryptFusion)."""
    acc = partials[0]
    for p in partials[1:]:
        acc = dcrt.add(acc, p)
    m_coeff = dcrt.to_coeff(acc)
    rows = dcrt.to_int_rows(m_coeff)
    coeffs = ckks.crt_interpolate_centered(rows, ct.basis.moduli)
    from .. import encoding
    return encoding.ckks_decode(coeffs, ctx.n, ct.scale, num_slots)


# ---------------------------------------------------------------------------
# Interactive joint evaluation keys (reference: threshold-fhe.cpp rounds;
# base-multiparty.cpp MultiKeySwitchGen / MultiAddEvalKeys /
# MultiMultEvalKey / MultiAddEvalMultKeys / MultiEvalAutomorphismKeyGen)
# ---------------------------------------------------------------------------

from .. import keyswitch  # noqa: E402


def _share_poly_qp(ctx: CKKSContext, sk_i: SecretKey) -> RnsPoly:
    return sk_i.poly(ctx.full_qp_basis)


def evalmult_round1(ctx: CKKSContext, sk_i: SecretKey,
                    rng: np.random.Generator,
                    prev_key: keyswitch.KSKey | None = None
                    ) -> keyswitch.KSKey:
    """Party i's round-1 share: keyswitch key (s_i -> s_i) under common
    randomness a (fresh for the lead, reused from the previous party
    otherwise). Reference: KeySwitchGen + MultiKeySwitchGen."""
    s_i = _share_poly_qp(ctx, sk_i)
    if prev_key is None:
        return keyswitch.keygen(ctx.ks_params, s_i, s_i, rng,
                                ctx.params.sigma)
    return keyswitch.keygen_with_a(ctx.ks_params, s_i, s_i,
                                   keyswitch.key_a_datas(prev_key), rng,
                                   ctx.params.sigma)


def evalmult_accumulate_round1(shares: Sequence[keyswitch.KSKey]
                               ) -> keyswitch.KSKey:
    """Sum the b components: joint key encrypting s under s
    (reference: MultiAddEvalKeys)."""
    acc = shares[0]
    for k in shares[1:]:
        acc = keyswitch.add_keys_b(acc, k)
    return acc


def evalmult_round2(ctx: CKKSContext, sk_i: SecretKey,
                    joint_ab: keyswitch.KSKey,
                    rng: np.random.Generator) -> keyswitch.KSKey:
    """Party i's round-2 share: s_i * joint_ab (+ fresh noise)
    (reference: MultiMultEvalKey)."""
    return keyswitch.scale_key_by_share(joint_ab, _share_poly_qp(ctx, sk_i),
                                        rng, ctx.params.sigma)


def evalmult_finalize(shares: Sequence[keyswitch.KSKey]) -> keyswitch.KSKey:
    """Sum the round-2 shares into the joint relinearization key for
    s^2 -> s (reference: MultiAddEvalMultKeys)."""
    acc = shares[0]
    for k in shares[1:]:
        acc = keyswitch.add_keys_full(acc, k)
    return acc


def rot_keygen_share(ctx: CKKSContext, sk_i: SecretKey, rot: int,
                     rng: np.random.Generator,
                     prev_key: keyswitch.KSKey | None = None
                     ) -> keyswitch.KSKey:
    """Party i's share of a joint rotation key: b_i = -a s_i + e +
    f * sigma_k(s_i); summing shares yields the joint automorphism key in
    ONE round (reference: MultiEvalAutomorphismKeyGen)."""
    qp = ctx.full_qp_basis
    s_i = sk_i.poly(qp)
    k = ckks.rotation_indices_to_galois(ctx.n, rot)
    s_rot = dcrt.automorphism(s_i, k)
    if prev_key is None:
        return keyswitch.keygen(ctx.ks_params, s_i, s_rot, rng,
                                ctx.params.sigma)
    return keyswitch.keygen_with_a(ctx.ks_params, s_i, s_rot,
                                   keyswitch.key_a_datas(prev_key), rng,
                                   ctx.params.sigma)


def rot_keygen_finalize(shares: Sequence[keyswitch.KSKey]
                        ) -> keyswitch.KSKey:
    acc = shares[0]
    for k in shares[1:]:
        acc = keyswitch.add_keys_b(acc, k)
    return acc
