"""BGV scheme over RNS towers (TPU-native).

Covers the reference's BGVrns family (``pke/lib/scheme/bgvrns/``): exact
integer arithmetic on packed Z_t slots, error scaled by the plaintext
modulus t, modulus switching that keeps the plaintext invariant.

Design choice (mirrors the reference's FLEXIBLE* technique requirement):
every ciphertext modulus is chosen ≡ 1 (mod 2n·t'), where t' = t for odd t.
Then q_l ≡ 1 (mod t), so ModReduce's division by q_l fixes the plaintext
slot values (no scale tracking needed), and all moduli stay NTT-friendly.

Shares keygen/keyswitch/automorphism machinery with CKKS — the scheme layer
really is a thin functional delta, as in the reference's class hierarchy
(base-* -> rns-* -> scheme-*).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Dict, Sequence, Tuple

import jax
import numpy as np

from .. import dcrt, encoding, keyswitch
from ..dcrt import Format, RnsBasis, RnsPoly
from ..ops import ntt as ntt_ops
from ..ops import rns
from ..ops.limb import U64
from ..ops.modular import (add_mod, make_mod_consts, mul_mod_shoup,
                           shoup_precon_int, sub_mod, switch_modulus)
from ..utils import nbtheory, sampling, security
from .ckks import crt_interpolate_centered


@dataclasses.dataclass(frozen=True)
class BGVParams:
    ring_dim: int = 1 << 12
    mult_depth: int = 2
    plaintext_modulus: int = 65537
    mod_size: int = 60
    dnum: int = 3
    sigma: float = 3.19
    security_level: str = "HEStd_NotSet"

    @property
    def num_towers(self) -> int:
        return self.mult_depth + 1


@dataclasses.dataclass(frozen=True)
class BGVContext:
    params: BGVParams
    q_moduli: Tuple[int, ...]
    p_moduli: Tuple[int, ...]

    @property
    def n(self) -> int:
        return self.params.ring_dim

    @property
    def t(self) -> int:
        return self.params.plaintext_modulus

    @property
    def ks_params(self) -> keyswitch.KSParams:
        alpha = -(-len(self.q_moduli) // self.params.dnum)
        return keyswitch.KSParams(self.n, self.q_moduli, self.p_moduli, alpha,
                                  plaintext_correction=self.t)

    def basis(self, towers: int | None = None) -> RnsBasis:
        towers = len(self.q_moduli) if towers is None else towers
        return RnsBasis(self.n, self.q_moduli[:towers])

    @property
    def full_qp_basis(self) -> RnsBasis:
        return RnsBasis(self.n, self.q_moduli + self.p_moduli)


def gen_context(params: BGVParams) -> BGVContext:
    n, t = params.ring_dim, params.plaintext_modulus
    assert t % 2 == 1 and nbtheory.is_prime(t)
    assert (t - 1) % (2 * n) == 0, "t must be ≡ 1 mod 2n for packed slots"
    m = 2 * n * t  # q ≡ 1 mod 2n (NTT) and mod t (plaintext invariance)
    qs = []
    cursor = 1 << params.mod_size
    while len(qs) < params.num_towers:
        cursor = nbtheory.prev_ntt_prime_below(cursor, m)
        qs.append(cursor)
    alpha = -(-params.num_towers // params.dnum)
    ps = []
    while len(ps) < alpha:
        cursor = nbtheory.prev_ntt_prime_below(cursor, m)
        ps.append(cursor)
    log_qp = sum(q.bit_length() for q in qs) + sum(p.bit_length() for p in ps)
    security.validate(n, log_qp, params.security_level)
    return BGVContext(params, tuple(qs), tuple(ps))


# ---------------------------------------------------------------------------
# Keys (shared structures with CKKS)
# ---------------------------------------------------------------------------

from .ckks import PublicKey, SecretKey  # noqa: E402  (shared key types)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Ciphertext:
    polys: Tuple[RnsPoly, ...]

    @property
    def basis(self) -> RnsBasis:
        return self.polys[0].basis

    @property
    def towers(self) -> int:
        return self.basis.L


def keygen(ctx: BGVContext, rng: np.random.Generator
           ) -> Tuple[PublicKey, SecretKey]:
    """pk = (-a s + t e, a) — error pre-scaled by t (BGV convention)."""
    n = ctx.n
    sk = SecretKey(sampling.ternary_coeffs(n, rng))
    basis = ctx.basis()
    s = sk.poly(basis)
    a = dcrt.from_int_rows(
        basis, sampling.uniform_rns_rows(n, basis.moduli, rng), Format.EVAL)
    e = _sample_scaled_error(ctx, basis, rng)
    b = dcrt.sub(e, dcrt.mul(a, s))
    return PublicKey(b, a), sk


def _sample_scaled_error(ctx: BGVContext, basis: RnsBasis,
                         rng: np.random.Generator) -> RnsPoly:
    coeffs = sampling.gaussian_coeffs(ctx.n, rng, ctx.params.sigma) * ctx.t
    rows = sampling.signed_to_rns_rows(coeffs, basis.moduli)
    return dcrt.to_eval(dcrt.from_int_rows(basis, rows, Format.COEFF))


def relin_keygen(ctx: BGVContext, sk: SecretKey,
                 rng: np.random.Generator) -> keyswitch.KSKey:
    qp = ctx.full_qp_basis
    s = sk.poly(qp)
    s2 = dcrt.mul(s, s)
    return keyswitch.keygen(ctx.ks_params, s, s2, rng, ctx.params.sigma,
                            error_scale=ctx.t)


def rot_keygen(ctx: BGVContext, sk: SecretKey, galois_elts: Sequence[int],
               rng: np.random.Generator) -> Dict[int, keyswitch.KSKey]:
    """Keys for sigma_k(s) -> s, keyed by Galois element k (odd)."""
    qp = ctx.full_qp_basis
    s = sk.poly(qp)
    keys = {}
    for k in galois_elts:
        s_rot = dcrt.automorphism(s, k)
        keys[k] = keyswitch.keygen(ctx.ks_params, s, s_rot, rng,
                                   ctx.params.sigma, error_scale=ctx.t)
    return keys


# ---------------------------------------------------------------------------
# Encrypt / decrypt
# ---------------------------------------------------------------------------


def encode(ctx: BGVContext, values: Sequence[int],
           towers: int | None = None) -> RnsPoly:
    coeffs = encoding.packed_encode(values, ctx.n, ctx.t)
    basis = ctx.basis(towers)
    rows = sampling.signed_to_rns_rows(coeffs, basis.moduli)
    return dcrt.to_eval(dcrt.from_int_rows(basis, rows, Format.COEFF))


def encrypt(ctx: BGVContext, pk: PublicKey, values: Sequence[int],
            rng: np.random.Generator) -> Ciphertext:
    basis = ctx.basis()
    mpoly = encode(ctx, values)
    v_rows = sampling.signed_to_rns_rows(
        sampling.ternary_coeffs(ctx.n, rng), basis.moduli)
    v = dcrt.to_eval(dcrt.from_int_rows(basis, v_rows, Format.COEFF))
    e0 = _sample_scaled_error(ctx, basis, rng)
    e1 = _sample_scaled_error(ctx, basis, rng)
    c0 = dcrt.add(dcrt.add(dcrt.mul(pk.b, v), e0), mpoly)
    c1 = dcrt.add(dcrt.mul(pk.a, v), e1)
    return Ciphertext((c0, c1))


def decrypt(ctx: BGVContext, sk: SecretKey, ct: Ciphertext,
            num_slots: int | None = None) -> list:
    basis = ct.basis
    s = sk.poly(basis)
    acc = ct.polys[0]
    s_pow = s
    for c in ct.polys[1:]:
        acc = dcrt.add(acc, dcrt.mul(c, s_pow))
        s_pow = dcrt.mul(s_pow, s)
    m_coeff = dcrt.to_coeff(acc)
    rows = dcrt.to_int_rows(m_coeff)
    centered = crt_interpolate_centered(rows, basis.moduli)
    coeffs_mod_t = [c % ctx.t for c in centered]
    slots = encoding.packed_decode(coeffs_mod_t, ctx.n, ctx.t)
    return slots[:num_slots] if num_slots else slots


# ---------------------------------------------------------------------------
# Homomorphic ops
# ---------------------------------------------------------------------------


def eval_add(ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
    assert ct1.basis == ct2.basis
    k = max(len(ct1.polys), len(ct2.polys))
    ps = []
    for i in range(k):
        if i < len(ct1.polys) and i < len(ct2.polys):
            ps.append(dcrt.add(ct1.polys[i], ct2.polys[i]))
        elif i < len(ct1.polys):
            ps.append(ct1.polys[i])
        else:
            ps.append(ct2.polys[i])
    return Ciphertext(tuple(ps))


def eval_sub(ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
    assert ct1.basis == ct2.basis
    k = max(len(ct1.polys), len(ct2.polys))
    ps = []
    for i in range(k):
        if i < len(ct1.polys) and i < len(ct2.polys):
            ps.append(dcrt.sub(ct1.polys[i], ct2.polys[i]))
        elif i < len(ct1.polys):
            ps.append(ct1.polys[i])
        else:
            ps.append(dcrt.neg(ct2.polys[i]))
    return Ciphertext(tuple(ps))


def eval_mult(ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
    assert ct1.basis == ct2.basis
    d1, d2 = len(ct1.polys), len(ct2.polys)
    out = [None] * (d1 + d2 - 1)
    for i in range(d1):
        for j in range(d2):
            p = dcrt.mul(ct1.polys[i], ct2.polys[j])
            out[i + j] = p if out[i + j] is None else dcrt.add(out[i + j], p)
    return Ciphertext(tuple(out))


def relinearize(ct: Ciphertext, evk: keyswitch.KSKey) -> Ciphertext:
    assert len(ct.polys) == 3
    d0, d1 = keyswitch.apply(evk, ct.polys[2])
    return Ciphertext((dcrt.add(ct.polys[0], d0),
                       dcrt.add(ct.polys[1], d1)))


def eval_mult_relin(ct1: Ciphertext, ct2: Ciphertext,
                    evk: keyswitch.KSKey) -> Ciphertext:
    return relinearize(eval_mult(ct1, ct2), evk)


def compress(ctx: BGVContext, ct: Ciphertext, towers_left: int = 1
             ) -> Ciphertext:
    """Shrink the ciphertext modulus before transmission/decryption
    (role of LeveledSHERNS::Compress, rns-leveledshe.cpp:358-372, with
    BGV's t-preserving ModReduce as the per-tower drop)."""
    while ct.basis.L > towers_left:
        ct = mod_reduce(ctx, ct)
    return ct


def mod_reduce(ctx: BGVContext, ct: Ciphertext) -> Ciphertext:
    """BGV modulus switch: divide by q_last keeping plaintext mod t fixed.

    delta = centered(x_last) + q_last * centered(w), w ≡ -x_last/q_last (t);
    y_i = (x_i - delta) / q_last mod q_i. Since q_last ≡ 1 (mod t) by
    construction, slot values are unchanged.
    (Reference: LeveledSHEBGVRNS::ModReduceInternalInPlace / ModReduce,
    ``dcrtpoly-impl.h:792``.)
    """
    moduli = ct.basis.moduli
    new_basis = ct.basis.drop_last()
    polys = [dcrt.make_poly(new_basis,
                            _bgv_rescale_tables(ctx, moduli)(p.data),
                            Format.EVAL)
             for p in ct.polys]
    return Ciphertext(tuple(polys))


@lru_cache(maxsize=None)
def _bgv_rescale_tables(ctx: BGVContext, moduli: Tuple[int, ...]):
    """Jitted eval-domain BGV rescale for one modulus-chain level."""
    t = ctx.t
    n = ctx.n
    *rest, q_last = moduli
    t_mod = make_mod_consts((t,), trailing_dims=1)
    old_mod = make_mod_consts((q_last,), trailing_dims=1)
    new_mod = make_mod_consts(rest, trailing_dims=1)
    # [-q_last^{-1} mod t] as a Shoup constant mod t
    neg_qinv_t = (-pow(q_last % t, -1, t)) % t
    from ..ops.limb import from_int
    c_nq = from_int(neg_qinv_t, (1, 1))
    c_nq_pre = from_int(shoup_precon_int(neg_qinv_t, t), (1, 1))
    # [q_last]_{q_i} Shoup constants
    ql_modq = [[q_last % q] for q in rest]
    from ..ops.limb import from_int_array
    c_ql = from_int_array(np.asarray(ql_modq, dtype=object))
    c_ql_pre = from_int_array(np.asarray(
        [[shoup_precon_int(q_last % q, q)] for q in rest], dtype=object))
    # [q_last^{-1}]_{q_i}
    inv = [[pow(q_last % q, -1, q)] for q in rest]
    c_inv = from_int_array(np.asarray(inv, dtype=object))
    c_inv_pre = from_int_array(np.asarray(
        [[shoup_precon_int(v[0], q)] for v, q in zip(inv, rest)], dtype=object))
    last_plan = ntt_ops.make_plan(n, (q_last,))
    rest_plan = ntt_ops.make_plan(n, tuple(rest))

    @jax.jit
    def fn(x: U64) -> U64:
        L = len(moduli)
        x_rest = U64(x.lo[: L - 1], x.hi[: L - 1])
        x_last = U64(x.lo[L - 1][None, :], x.hi[L - 1][None, :])
        xl_coeff = ntt_ops.inverse(last_plan, x_last)  # [1, n]
        # centered residue of x_last in each q_i and in t
        s = switch_modulus(xl_coeff, old_mod, new_mod)       # [L-1, n]
        d_t = switch_modulus(xl_coeff, old_mod, t_mod)       # [1, n]
        w = mul_mod_shoup(d_t, c_nq, c_nq_pre, t_mod.q)      # [1, n] mod t
        w_q = switch_modulus(w, t_mod, new_mod)              # centered, [L-1,n]
        delta = add_mod(s, mul_mod_shoup(w_q, c_ql, c_ql_pre, new_mod.q),
                        new_mod.q)
        delta_eval = ntt_ops.forward(rest_plan, delta)
        diff = sub_mod(x_rest, delta_eval, new_mod.q)
        return mul_mod_shoup(diff, c_inv, c_inv_pre, new_mod.q)

    return fn


def eval_automorphism(ct: Ciphertext, k: int,
                      rot_key: keyswitch.KSKey) -> Ciphertext:
    """Galois automorphism sigma_k + keyswitch (slot permutation).
    Hoisted order — decompose, then permute the digit stack — for the
    same TPU gather-into-NTT fusion pathology as ckks.eval_rotate."""
    assert len(ct.polys) == 2
    digits = keyswitch.hoist_decompose(rot_key.params, ct.polys[1])
    c0 = dcrt.automorphism(ct.polys[0], k)
    d0, d1 = keyswitch.hoist_rotate_apply(rot_key, digits, ct.basis, k)
    return Ciphertext((dcrt.add(c0, d0), d1))


def eval_add_plain(ctx: BGVContext, ct: Ciphertext,
                   values: Sequence[int]) -> Ciphertext:
    pt = encode(ctx, values, towers=ct.towers)
    return Ciphertext((dcrt.add(ct.polys[0], pt),) + ct.polys[1:])


def eval_mult_plain(ctx: BGVContext, ct: Ciphertext,
                    values: Sequence[int]) -> Ciphertext:
    pt = encode(ctx, values, towers=ct.towers)
    return Ciphertext(tuple(dcrt.mul(p, pt) for p in ct.polys))


def rotation_galois(n: int, r: int) -> int:
    """Galois element for a packed-slot row rotation by r: 5^r mod 2n
    (reference: EvalAtIndex -> FindAutomorphismIndex2n for BGV/BFV)."""
    return pow(5, r % (n // 2), 2 * n)


def eval_rotate(ct: Ciphertext, r: int, rot_key: keyswitch.KSKey
                ) -> Ciphertext:
    """Rotate both packed rows left by r (reference: EvalAtIndex; the
    packed encoding's 5-orbit slot order makes sigma_{5^r} a row roll)."""
    return eval_automorphism(ct, rotation_galois(ct.basis.n, r), rot_key)


def eval_flip_rows(ct: Ciphertext, key: keyswitch.KSKey) -> Ciphertext:
    """Swap the two packed rows (sigma_{2n-1}; reference: the column
    generator of PackedEncoding)."""
    return eval_automorphism(ct, 2 * ct.basis.n - 1, key)


def sum_galois_indices(n: int) -> list:
    """Galois elements for eval_sum's rotation tree + the row flip
    (reference: EvalSumKeyGen)."""
    return [rotation_galois(n, 1 << i)
            for i in range((n // 2).bit_length() - 1)] + [2 * n - 1]


def eval_sum(ct: Ciphertext, rot_keys) -> Ciphertext:
    """Every slot becomes the sum of ALL n slots (log(n/2) row rotations
    + one row flip; reference: AdvancedSHEBase::EvalSum for packed
    plaintexts)."""
    n = ct.basis.n
    out = ct
    for i in range((n // 2).bit_length() - 1):
        k = rotation_galois(n, 1 << i)
        out = eval_add(out, eval_automorphism(out, k, rot_keys[k]))
    flip = 2 * n - 1
    return eval_add(out, eval_automorphism(out, flip, rot_keys[flip]))


def eval_inner_product(ctx: BGVContext, ct1: Ciphertext, ct2: Ciphertext,
                       evk: keyswitch.KSKey, rot_keys) -> Ciphertext:
    """<ct1, ct2> over all slots, replicated (reference: EvalInnerProduct)."""
    return eval_sum(eval_mult_relin(ct1, ct2, evk), rot_keys)
