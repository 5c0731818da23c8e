"""Proxy re-encryption (PRE) for CKKS / BGV / BFV ciphertexts.

Role of the reference's PREBase (``pke/lib/schemebase/base-pre.cpp:40-74``):
ReKeyGen produces a key that lets an untrusted proxy transform a ciphertext
under Alice's secret into one under Bob's secret without decrypting.

Realization: the re-encryption key is exactly a hybrid key-switch key from
s_alice to s_bob (the same machinery as relinearization, with the roles of
the secrets swapped), so ReEncrypt is a single key switch of the c1
component — no scheme-specific code.

Security modes (reference: ProxyReEncryptionMode, ``constants.h:75-101``,
and the flooding-parameter derivation in
``bgvrns-parametergeneration.cpp:281-344``):

* ``INDCPA``       — plain key switch (secure against honest-but-curious
                     proxies only).
* ``FIXED_NOISE_HRA`` — re-randomize with an encryption of zero under the
                     target public key and flood with 20 bits of fixed
                     Gaussian noise (``NOISE_FLOODING::PRE_SD = 2^20``,
                     ``constants.h:161``) — the multihop PRE default.
* ``NOISE_FLOODING_HRA`` — same, with the flooding parameter computed from
                     the statistical-security / adversarial-query budget
                     (provable HRA security).
"""

from __future__ import annotations

import math

import numpy as np

from .. import dcrt, keyswitch
from ..ops.limb import U64
from ..utils import sampling

PRE_SD = 1 << 20   # NOISE_FLOODING::PRE_SD (constants.h:161)


def rekey_gen(ctx, sk_from, sk_to, rng: np.random.Generator,
              error_scale: int = 1) -> keyswitch.KSKey:
    """Key switching s_from -> s_to: lets the proxy re-target ciphertexts.

    ctx must expose full_qp_basis / ks_params (all three scheme contexts do).
    For BGV pass error_scale=ctx.t.
    """
    qp = ctx.full_qp_basis
    s_from = sk_from.poly(qp)
    s_to = sk_to.poly(qp)
    return keyswitch.keygen(ctx.ks_params, s_to, s_from, rng,
                            ctx.params.sigma, error_scale=error_scale)


def flooding_sigma(ctx, mode: str, num_queries: int = 1,
                   stat_security: int = 30,
                   threshold_parties: int = 1) -> float:
    """Flooding distribution parameter (reference:
    ParameterGenerationBGVRNS::InitializeFloodingDgg,
    ``bgvrns-parametergeneration.cpp:281-344``, HYBRID branch)."""
    if mode == "INDCPA":
        return 0.0
    if mode == "FIXED_NOISE_HRA":
        return float(PRE_SD)
    if mode != "NOISE_FLOODING_HRA":
        raise ValueError(f"unknown PRE mode {mode!r}")
    n = ctx.n
    sigma = ctx.params.sigma
    alpha = 36.0                      # assurance measure (OpenFHE default)
    B_e = math.sqrt(alpha) * sigma
    B_key = float(threshold_parties)  # ternary secrets
    ksp = ctx.ks_params
    dnum = ksp.dnum
    towers_per_digit = -(-len(ksp.q_moduli) // dnum)
    aux_bits = max(q.bit_length() for q in ksp.p_moduli)
    noise = towers_per_digit * dnum * math.sqrt(n) * B_e * (1 + 2 * B_key)
    noise += aux_bits * (1 + math.sqrt(n) * B_key)
    return math.sqrt(12 * num_queries) * (2 ** (stat_security / 2)) * noise


def _slice_poly(p: dcrt.RnsPoly, L: int) -> dcrt.RnsPoly:
    """First L towers of an RnsPoly (the ct may sit below the pk level)."""
    if p.basis.L == L:
        return p
    b = p.basis.drop_last(p.basis.L - L)
    return dcrt.make_poly(b, U64(p.data.lo[:L], p.data.hi[:L]), p.fmt)


def encrypt_zero(ctx, pk, basis: dcrt.RnsBasis,
                 rng: np.random.Generator,
                 error_scale: int = 1):
    """EncryptZeroCore under pk at a (possibly reduced) basis (reference:
    ``base-pke.cpp:145``): (pk_b*v + t*e0, pk_a*v + t*e1)."""
    L = basis.L
    v_rows = sampling.signed_to_rns_rows(
        sampling.ternary_coeffs(ctx.n, rng), basis.moduli)
    v = dcrt.to_eval(dcrt.from_int_rows(basis, v_rows, dcrt.Format.COEFF))

    def err():
        e = sampling.gaussian_coeffs(ctx.n, rng, ctx.params.sigma)
        rows = sampling.signed_to_rns_rows(e * error_scale, basis.moduli)
        return dcrt.to_eval(dcrt.from_int_rows(basis, rows,
                                               dcrt.Format.COEFF))

    b = _slice_poly(pk.b, L)
    a = _slice_poly(pk.a, L)
    return (dcrt.add(dcrt.mul(b, v), err()),
            dcrt.add(dcrt.mul(a, v), err()))


def re_encrypt(ct, rk: keyswitch.KSKey, ctx=None, pk=None,
               mode: str = "INDCPA", rng: np.random.Generator | None = None,
               noise_scale: int = 1, num_queries: int = 1):
    """Transform ct(s_from) -> ct(s_to). Works for any 2-component
    ciphertext type (CKKS/BGV/BFV share the (c0, c1) + keyswitch shape).

    HRA modes (reference ``base-pre.cpp:55-70``): pass ctx, pk — the
    SENDER's public key, so the zero-encryption is a valid sender
    ciphertext BEFORE the switch (what the reference's own UnitTestPRE
    passes, despite its doc comment) — and rng; the ciphertext is
    re-randomized with an encryption of zero and the c0 component flooded
    with noise_scale * N(0, flooding_sigma). For BGV pass noise_scale=ctx.t.
    """
    assert len(ct.polys) == 2, "relinearize before re-encryption"
    c0, c1 = ct.polys
    if mode != "INDCPA":
        assert ctx is not None and pk is not None and rng is not None, \
            "HRA modes need ctx, the SENDER's public key, and an rng"
        z0, z1 = encrypt_zero(ctx, pk, c0.basis, rng,
                              error_scale=noise_scale)
        c0, c1 = dcrt.add(c0, z0), dcrt.add(c1, z1)
        sd = flooding_sigma(ctx, mode, num_queries)
        flood = np.rint(rng.normal(0.0, sd, size=ctx.n)).astype(np.int64)
        rows = sampling.signed_to_rns_rows(flood * noise_scale,
                                           c0.basis.moduli)
        enf = dcrt.to_eval(dcrt.from_int_rows(c0.basis, rows,
                                              dcrt.Format.COEFF))
        c0 = dcrt.add(c0, enf)
    d0, d1 = keyswitch.apply(rk, c1)
    new_polys = (dcrt.add(c0, d0), d1)
    if hasattr(ct, "scale"):
        return type(ct)(new_polys, ct.scale)
    return type(ct)(new_polys)
