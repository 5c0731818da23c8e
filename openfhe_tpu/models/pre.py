"""Proxy re-encryption (PRE) for CKKS / BGV / BFV ciphertexts.

Role of the reference's PREBase (``pke/lib/schemebase/base-pre.cpp``):
ReKeyGen produces a key that lets an untrusted proxy transform a ciphertext
under Alice's secret into one under Bob's secret without decrypting.

Realization: the re-encryption key is exactly a hybrid key-switch key from
s_alice to s_bob (the same machinery as relinearization, with the roles of
the secrets swapped), so ReEncrypt is a single key switch of the c1
component — no scheme-specific code.
"""

from __future__ import annotations

import numpy as np

from .. import dcrt, keyswitch


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


def re_encrypt(ct, rk: keyswitch.KSKey):
    """Transform ct(s_from) -> ct(s_to). Works for any 2-component
    ciphertext type (CKKS/BGV/BFV share the (c0, c1) + keyswitch shape)."""
    assert len(ct.polys) == 2, "relinearize before re-encryption"
    d0, d1 = keyswitch.apply(rk, ct.polys[1])
    new_polys = (dcrt.add(ct.polys[0], d0), d1)
    if hasattr(ct, "scale"):
        return type(ct)(new_polys, ct.scale)
    return type(ct)(new_polys)
