"""BFV (scale-invariant) scheme over RNS towers (TPU-native).

Covers the reference's BFVrns family (``pke/lib/scheme/bfvrns/``), HPS
multiplication variant: messages scaled by Delta = floor(Q/t) at encryption;
EvalMult lifts both ciphertexts to the extended basis Q*R (approximate
mod-up — the spurious Q-multiples vanish after the t/Q scale-and-round),
tensors there, scales by t/Q into R, and switches exactly back to Q.

Device pipeline per EvalMult: 4 iNTT(Q) + 4 NTT(QR) + tensor + 3 iNTT(QR)
+ 3 [scale-and-round + exact switch] + 3 NTT(Q) — all batched array code.
(Reference stack: BFVrns EvalMultCore -> ExpandCRTBasis -> ScaleAndRound,
``bfvrns-leveledshe.cpp`` + ``dcrtpoly-impl.h:1311,1876``.)
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
from ..utils import nbtheory, sampling, security
from .ckks import PublicKey, SecretKey, crt_interpolate_centered


@dataclasses.dataclass(frozen=True)
class BFVParams:
    ring_dim: int = 1 << 12
    plaintext_modulus: int = 65537
    num_towers: int = 3
    mod_size: int = 60
    dnum: int = 3
    sigma: float = 3.19
    security_level: str = "HEStd_NotSet"


@dataclasses.dataclass(frozen=True)
class BFVContext:
    params: BFVParams
    q_moduli: Tuple[int, ...]
    r_moduli: Tuple[int, ...]  # extension basis for multiplication
    p_moduli: Tuple[int, ...]  # keyswitch special primes

    @property
    def n(self) -> int:
        return self.params.ring_dim

    @property
    def t(self) -> int:
        return self.params.plaintext_modulus

    @property
    def Q(self) -> int:
        prod = 1
        for q in self.q_moduli:
            prod *= q
        return prod

    @property
    def delta_rows(self) -> Tuple[int, ...]:
        """[Delta]_{q_i} with Delta = floor(Q/t)."""
        d = self.Q // self.t
        return tuple(d % q for q in self.q_moduli)

    @property
    def ks_params(self) -> keyswitch.KSParams:
        alpha = -(-len(self.q_moduli) // self.params.dnum)
        return keyswitch.KSParams(self.n, self.q_moduli, self.p_moduli, alpha)

    def basis(self) -> RnsBasis:
        return RnsBasis(self.n, self.q_moduli)

    @property
    def ext_basis(self) -> RnsBasis:
        return RnsBasis(self.n, self.q_moduli + self.r_moduli)

    @property
    def full_qp_basis(self) -> RnsBasis:
        return RnsBasis(self.n, self.q_moduli + self.p_moduli)


def gen_context(params: BFVParams) -> BFVContext:
    n, t = params.ring_dim, params.plaintext_modulus
    assert (t - 1) % (2 * n) == 0, "t must be ≡ 1 mod 2n for packed slots"
    m = 2 * n
    qs = tuple(nbtheory.generate_prime_chain(params.num_towers,
                                             params.mod_size, n))
    rs = tuple(nbtheory.generate_prime_chain(params.num_towers + 1,
                                             params.mod_size, n, list(qs)))
    alpha = -(-params.num_towers // params.dnum)
    ps = tuple(nbtheory.generate_prime_chain(alpha, params.mod_size, n,
                                             list(qs) + list(rs)))
    log_qp = sum(q.bit_length() for q in qs) + sum(p.bit_length() for p in ps)
    security.validate(n, log_qp, params.security_level)
    return BFVContext(params, qs, rs, ps)


def keygen(ctx: BFVContext, rng: np.random.Generator
           ) -> Tuple[PublicKey, SecretKey]:
    n = ctx.n
    sk = SecretKey(sampling.ternary_coeffs(n, rng))
    basis = ctx.basis()
    s = sk.poly(basis)
    a = dcrt.from_int_rows(
        basis, sampling.uniform_rns_rows(n, basis.moduli, rng), Format.EVAL)
    e = _error_poly(ctx, basis, rng)
    b = dcrt.sub(e, dcrt.mul(a, s))
    return PublicKey(b, a), sk


def _error_poly(ctx: BFVContext, basis: RnsBasis,
                rng: np.random.Generator) -> RnsPoly:
    rows = sampling.signed_to_rns_rows(
        sampling.gaussian_coeffs(ctx.n, rng, ctx.params.sigma), basis.moduli)
    return dcrt.to_eval(dcrt.from_int_rows(basis, rows, Format.COEFF))


def relin_keygen(ctx: BFVContext, sk: SecretKey,
                 rng: np.random.Generator) -> keyswitch.KSKey:
    qp = ctx.full_qp_basis
    s = sk.poly(qp)
    s2 = dcrt.mul(s, s)
    return keyswitch.keygen(ctx.ks_params, s, s2, rng, ctx.params.sigma)


def rot_keygen(ctx: BFVContext, sk: SecretKey, galois_elts: Sequence[int],
               rng: np.random.Generator) -> Dict[int, keyswitch.KSKey]:
    qp = ctx.full_qp_basis
    s = sk.poly(qp)
    return {k: keyswitch.keygen(ctx.ks_params, s, dcrt.automorphism(s, k),
                                rng, ctx.params.sigma)
            for k in galois_elts}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Ciphertext:
    polys: Tuple[RnsPoly, ...]
    # reference: CiphertextImpl::GetNoiseScaleDeg — drives the level-drop
    # decision of the HPSPOVERQLEVELED multiplication variant.
    noise_deg: int = dataclasses.field(default=1, metadata=dict(static=True))

    @property
    def basis(self) -> RnsBasis:
        return self.polys[0].basis


def encode(ctx: BFVContext, values: Sequence[int]) -> RnsPoly:
    """Packed slots -> Delta-scaled EVAL plaintext poly over Q."""
    coeffs = encoding.packed_encode(values, ctx.n, ctx.t)
    basis = ctx.basis()
    rows = sampling.signed_to_rns_rows(coeffs, basis.moduli)
    p = dcrt.to_eval(dcrt.from_int_rows(basis, rows, Format.COEFF))
    return dcrt.mul_tower_const(p, ctx.delta_rows)


def encode_coef(ctx: BFVContext, values: Sequence[int]) -> RnsPoly:
    """Coefficient-packed plaintext (role of CoefPackedEncoding,
    pke/lib/encoding/coefpackedencoding.cpp): integers directly as
    Delta-scaled polynomial coefficients, no slot NTT."""
    coeffs = encoding.coef_encode(values, ctx.n, ctx.t)
    basis = ctx.basis()
    rows = sampling.signed_to_rns_rows(coeffs, basis.moduli)
    p = dcrt.to_eval(dcrt.from_int_rows(basis, rows, Format.COEFF))
    return dcrt.mul_tower_const(p, ctx.delta_rows)


def encode_string(ctx: BFVContext, text: str) -> RnsPoly:
    """String plaintext (role of StringEncoding,
    pke/lib/encoding/stringencoding.cpp); requires t >= 256."""
    assert ctx.t >= 256, "string encoding needs plaintext modulus >= 256"
    coeffs = encoding.string_encode(text, ctx.n)
    basis = ctx.basis()
    rows = sampling.signed_to_rns_rows(coeffs, basis.moduli)
    p = dcrt.to_eval(dcrt.from_int_rows(basis, rows, Format.COEFF))
    return dcrt.mul_tower_const(p, ctx.delta_rows)


def encrypt_poly(ctx: BFVContext, pk: PublicKey, mpoly: RnsPoly,
                 rng: np.random.Generator) -> Ciphertext:
    """Encrypt a pre-encoded EVAL-format plaintext polynomial."""
    basis = ctx.basis()
    v_rows = sampling.signed_to_rns_rows(
        sampling.ternary_coeffs(ctx.n, rng), basis.moduli)
    v = dcrt.to_eval(dcrt.from_int_rows(basis, v_rows, Format.COEFF))
    e0 = _error_poly(ctx, basis, rng)
    e1 = _error_poly(ctx, basis, rng)
    c0 = dcrt.add(dcrt.add(dcrt.mul(pk.b, v), e0), mpoly)
    c1 = dcrt.add(dcrt.mul(pk.a, v), e1)
    return Ciphertext((c0, c1))


def encrypt(ctx: BFVContext, pk: PublicKey, values: Sequence[int],
            rng: np.random.Generator) -> Ciphertext:
    basis = ctx.basis()
    mpoly = encode(ctx, values)
    v_rows = sampling.signed_to_rns_rows(
        sampling.ternary_coeffs(ctx.n, rng), basis.moduli)
    v = dcrt.to_eval(dcrt.from_int_rows(basis, v_rows, Format.COEFF))
    e0 = _error_poly(ctx, basis, rng)
    e1 = _error_poly(ctx, basis, rng)
    c0 = dcrt.add(dcrt.add(dcrt.mul(pk.b, v), e0), mpoly)
    c1 = dcrt.add(dcrt.mul(pk.a, v), e1)
    return Ciphertext((c0, c1))


def decrypt(ctx: BFVContext, sk: SecretKey, ct: Ciphertext,
            num_slots: int | None = None) -> list:
    """m = packed_decode(round(t*(c0 + c1 s + ...)/Q) mod t)."""
    basis = ct.basis
    s = sk.poly(basis)
    acc = ct.polys[0]
    s_pow = s
    for c in ct.polys[1:]:
        acc = dcrt.add(acc, dcrt.mul(c, s_pow))
        s_pow = dcrt.mul(s_pow, s)
    coeff = dcrt.to_coeff(acc)
    scaled = _decrypt_scale(ctx.t, basis.moduli)(coeff.data)
    from ..ops.limb import to_int_array
    vals = [int(v) for v in to_int_array(scaled)[0]]
    slots = encoding.packed_decode(vals, ctx.n, ctx.t)
    return slots[:num_slots] if num_slots else slots


def _decrypt_coeffs(ctx: BFVContext, sk: SecretKey, ct: Ciphertext) -> list:
    """Raw plaintext coefficients mod t (shared by coef/string decode)."""
    basis = ct.basis
    s = sk.poly(basis)
    acc = ct.polys[0]
    s_pow = s
    for c in ct.polys[1:]:
        acc = dcrt.add(acc, dcrt.mul(c, s_pow))
        s_pow = dcrt.mul(s_pow, s)
    coeff = dcrt.to_coeff(acc)
    scaled = _decrypt_scale(ctx.t, basis.moduli)(coeff.data)
    from ..ops.limb import to_int_array
    return [int(v) for v in to_int_array(scaled)[0]]


def decrypt_coef(ctx: BFVContext, sk: SecretKey, ct: Ciphertext,
                 length: int | None = None) -> list:
    return encoding.coef_decode(_decrypt_coeffs(ctx, sk, ct), ctx.n, ctx.t,
                                length)


def decrypt_string(ctx: BFVContext, sk: SecretKey, ct: Ciphertext) -> str:
    return encoding.string_decode(_decrypt_coeffs(ctx, sk, ct))


@lru_cache(maxsize=None)
def _decrypt_scale(t: int, moduli: Tuple[int, ...]):
    """round(t * x / Q_l) mod t over the CIPHERTEXT's basis (compressed
    ciphertexts decrypt over fewer towers)."""

    @jax.jit
    def fn(x: U64) -> U64:
        return rns.scale_and_round(x, moduli, (t,), t, moduli)

    return fn


def compress(ctx: BFVContext, ct: Ciphertext, towers_left: int = 1
             ) -> Ciphertext:
    """Shrink the ciphertext modulus before transmission/decryption
    (role of LeveledSHEBFVRNS::Compress, bfvrns-leveledshe.cpp:901-934):
    repeated DropLastElementAndScale; Delta becomes Q_l/t and the rounding
    error is absorbed as noise."""
    assert len(ct.polys) == 2, "relinearize before compressing"
    polys = list(ct.polys)
    while polys[0].basis.L > towers_left:
        moduli = polys[0].basis.moduli
        nb = polys[0].basis.drop_last()
        fn = _compress_step(moduli)
        polys = [dcrt.make_poly(nb, fn(p.data), Format.EVAL) for p in polys]
    return Ciphertext(tuple(polys), noise_deg=ct.noise_deg)


@lru_cache(maxsize=None)
def _compress_step(moduli: Tuple[int, ...]):
    return jax.jit(lambda d: rns.rescale_eval(d, moduli))


def eval_add(ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
    assert ct1.basis == ct2.basis
    return Ciphertext(tuple(dcrt.add(a, b)
                            for a, b in zip(ct1.polys, ct2.polys)),
                      noise_deg=max(ct1.noise_deg, ct2.noise_deg))


def eval_sub(ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
    assert ct1.basis == ct2.basis
    return Ciphertext(tuple(dcrt.sub(a, b)
                            for a, b in zip(ct1.polys, ct2.polys)),
                      noise_deg=max(ct1.noise_deg, ct2.noise_deg))


@lru_cache(maxsize=None)
def _mult_pipeline(ctx: BFVContext):
    """Jitted HPS EvalMult core over raw U64 stacks."""
    qm, rm = ctx.q_moduli, ctx.r_moduli
    sm = qm + rm
    t = ctx.t
    n = ctx.n
    q_basis = ctx.basis()
    s_basis = ctx.ext_basis

    def lift(x_eval: U64) -> U64:
        """EVAL over Q -> EVAL over S = Q∪R (approx mod-up)."""
        x_coeff = ntt_ops.inverse(q_basis.plan, x_eval)
        conv = rns.approx_switch_basis(x_coeff, qm, rm)
        lo = jax.numpy.concatenate([x_coeff.lo, conv.lo], axis=0)
        hi = jax.numpy.concatenate([x_coeff.hi, conv.hi], axis=0)
        return ntt_ops.forward(s_basis.plan, U64(lo, hi))

    def scale_back(y_eval: U64) -> U64:
        """EVAL over S -> EVAL over Q: round(t*Y/Q) via R, exact switch.

        The tensor Y is a negacyclic convolution, so round(t*Y/Q) is a
        SIGNED value of magnitude ~ t*n*(k/2+1)^2*Q << R/2: the R -> Q
        switch must center (round the overflow count), or every negative
        coefficient picks up a spurious +R mod Q — a noise term that
        scales with ||s||_1 and overflows Delta/2 for joint (multiparty)
        secrets."""
        y_coeff = ntt_ops.inverse(s_basis.plan, y_eval)
        y_r = rns.scale_and_round(y_coeff, sm, rm, t, qm)
        y_q = rns.exact_switch_basis(y_r, rm, qm, centered=True)
        return ntt_ops.forward(q_basis.plan, y_q)

    from ..ops.modular import add_mod, mul_mod

    @jax.jit
    def fn(c10, c11, c20, c21):
        l10, l11, l20, l21 = lift(c10), lift(c11), lift(c20), lift(c21)
        smod = s_basis.mod
        d0 = mul_mod(l10, l20, smod)
        d1 = add_mod(mul_mod(l10, l21, smod), mul_mod(l11, l20, smod), smod.q)
        d2 = mul_mod(l11, l21, smod)
        return scale_back(d0), scale_back(d1), scale_back(d2)

    return fn


def eval_mult(ctx: BFVContext, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
    assert len(ct1.polys) == 2 and len(ct2.polys) == 2
    fn = _mult_pipeline(ctx)
    d0, d1, d2 = fn(ct1.polys[0].data, ct1.polys[1].data,
                    ct2.polys[0].data, ct2.polys[1].data)
    basis = ctx.basis()
    return Ciphertext(tuple(dcrt.make_poly(basis, d, Format.EVAL)
                            for d in (d0, d1, d2)),
                      noise_deg=max(ct1.noise_deg, ct2.noise_deg) + 1)


# ---------------------------------------------------------------------------
# HPSPOVERQ / HPSPOVERQLEVELED multiplication variants (reference:
# MultiplicationTechnique, ``constants.h:127-128``; EvalMult dispatch
# ``bfvrns-leveledshe.cpp:193-306,357-383``; Kim-Polyakov-Zucca
# eprint 2021/204). ct2 is switched Q_l -> R_l with the R/Q scaling folded
# in (FastExpandCRTBasisPloverQ, ``dcrtpoly-impl.h:1413``), so the
# post-tensor scale-down divides by R_l instead of Q — cheaper and with a
# smaller rounding error. The LEVELED variant first drops towers the noise
# no longer needs (FindLevelsToDrop, ``bfvrns-leveledshe.cpp:77-166``) and
# expands back by multiplying with Q/Q_l (ExpandCRTBasisQlHat,
# ``dcrtpoly-impl.h:1514``).
# ---------------------------------------------------------------------------


def find_levels_to_drop(ctx: BFVContext, mult_depth: int,
                        key_switch: bool = False) -> int:
    """Noise-estimate of how many towers EvalMult can drop at this depth
    (port of FindLevelsToDrop, ``bfvrns-leveledshe.cpp:77-166``, HYBRID
    keyswitch branch)."""
    import math
    sigma = ctx.params.sigma
    alpha = 36.0
    p = float(ctx.t)
    n = ctx.n
    dcrt_bits = ctx.params.mod_size
    num_part_q = ctx.params.dnum
    k = -(-len(ctx.q_moduli) // num_part_q)   # towers per digit
    b_key = 1.0                                # ternary secrets
    b_err = sigma * math.sqrt(alpha)
    delta = 2.0 * math.sqrt(n)
    v_norm = b_err * (1.0 + 2.0 * delta * b_key)

    def noise_ks():
        return k * (num_part_q * delta * b_err + delta * b_key + 1.0) / 2

    c1 = delta * delta * p * b_key
    c2 = delta * delta * b_key * b_key / 2.0 + noise_ks()

    def logq_bfv():
        if mult_depth > 0:
            return (math.log(4 * p) + (mult_depth - 1) * math.log(c1)
                    + math.log(c1 * v_norm + mult_depth * c2))
        return math.log(p * 4 * v_norm)

    logq = logq_bfv()   # c2 is depth-independent under HYBRID: no iteration
    loge = logq / math.log(2) - 2 - math.log2(p)
    log_extra = math.log2(noise_ks()) if key_switch else math.log2(delta)
    levels = math.floor((loge - 2 * mult_depth - 16 - log_extra) / dcrt_bits)
    return max(0, min(levels, len(ctx.q_moduli) - 1))


@lru_cache(maxsize=None)
def _mult_pipeline_povq(ctx: BFVContext, drop: int):
    """Jitted HPSPOVERQ EvalMult core at Q_l = q_0..q_{L-1-drop}."""
    L = len(ctx.q_moduli)
    ql = ctx.q_moduli[:L - drop]
    rl = ctx.r_moduli[:len(ql) + 1]
    sl = ql + rl
    t, n = ctx.t, ctx.n
    Ql = 1
    for q in ql:
        Ql *= q
    Rl = 1
    for r in rl:
        Rl *= r
    QlHat_rows = tuple((_prod(ctx.q_moduli) // Ql) % q for q in ql)
    q_basis = ctx.basis()
    ql_basis = RnsBasis(n, ql)
    rl_basis = RnsBasis(n, rl)
    sl_basis = RnsBasis(n, sl)

    from ..ops.modular import add_mod, mul_mod, mul_mod_shoup

    def to_ql_coeff(x_eval: U64) -> U64:
        """EVAL over Q -> COEFF over Q_l: round(Q_l/Q * x) when dropping
        (the leveled ScaleAndRound drop, bfvrns-leveledshe.cpp:249-254)."""
        x_coeff = ntt_ops.inverse(q_basis.plan, x_eval)
        if drop == 0:
            return x_coeff
        return rns.scale_and_round(x_coeff, ctx.q_moduli, ql, Ql,
                                   ctx.q_moduli)

    def lift1(x_eval: U64) -> U64:
        """ct1 path: EVAL over Q -> EVAL over S_l (approx mod-up)."""
        x_coeff = to_ql_coeff(x_eval)
        conv = rns.approx_switch_basis(x_coeff, ql, rl)
        lo = jax.numpy.concatenate([x_coeff.lo, conv.lo], axis=0)
        hi = jax.numpy.concatenate([x_coeff.hi, conv.hi], axis=0)
        return ntt_ops.forward(sl_basis.plan, U64(lo, hi))

    def lift2(x_eval: U64) -> U64:
        """ct2 path: EVAL over Q -> EVAL over S_l carrying round(R_l/Q_l*x)
        (FastExpandCRTBasisPloverQ, dcrtpoly-impl.h:1413)."""
        x_coeff = to_ql_coeff(x_eval)
        y_r = rns.scale_and_round(x_coeff, ql, rl, Rl, ql)
        y_q = rns.exact_switch_basis(y_r, rl, ql)
        lo = jax.numpy.concatenate([y_q.lo, y_r.lo], axis=0)
        hi = jax.numpy.concatenate([y_q.hi, y_r.hi], axis=0)
        return ntt_ops.forward(sl_basis.plan, U64(lo, hi))

    def scale_back(y_eval: U64) -> U64:
        """EVAL over S_l -> EVAL over Q: round(t*Y/R_l) lands in Q_l; then
        multiply by Q/Q_l and zero-fill the dropped towers
        (ExpandCRTBasisQlHat: x*(Q/Q_l) == 0 mod the dropped primes)."""
        y_coeff = ntt_ops.inverse(sl_basis.plan, y_eval)
        y_ql = rns.scale_and_round(y_coeff, sl, ql, t, rl)
        if drop == 0:
            return ntt_ops.forward(q_basis.plan, y_ql)
        y_ql = dcrt.ntt_forward_data(ql_basis, y_ql)
        cc, pre = dcrt.tower_const(ql_basis, QlHat_rows)
        y_ql = mul_mod_shoup(y_ql, cc, pre, ql_basis.mod.q)
        zeros = jax.numpy.zeros((drop, n), dtype=y_ql.lo.dtype)
        return U64(jax.numpy.concatenate([y_ql.lo, zeros], axis=0),
                   jax.numpy.concatenate([y_ql.hi, zeros], axis=0))

    @jax.jit
    def fn(c10, c11, c20, c21):
        l10, l11 = lift1(c10), lift1(c11)
        l20, l21 = lift2(c20), lift2(c21)
        smod = sl_basis.mod
        d0 = mul_mod(l10, l20, smod)
        d1 = add_mod(mul_mod(l10, l21, smod), mul_mod(l11, l20, smod),
                     smod.q)
        d2 = mul_mod(l11, l21, smod)
        return scale_back(d0), scale_back(d1), scale_back(d2)

    return fn


def _prod(vals):
    out = 1
    for v in vals:
        out *= v
    return out


def eval_mult_povq(ctx: BFVContext, ct1: Ciphertext, ct2: Ciphertext,
                   leveled: bool = False) -> Ciphertext:
    """HPSPOVERQ (leveled=False) / HPSPOVERQLEVELED (leveled=True)
    multiplication (reference: bfvrns-leveledshe.cpp:208-306)."""
    assert len(ct1.polys) == 2 and len(ct2.polys) == 2
    deg = max(ct1.noise_deg, ct2.noise_deg)
    drop = find_levels_to_drop(ctx, deg - 1) if leveled else 0
    fn = _mult_pipeline_povq(ctx, drop)
    d0, d1, d2 = fn(ct1.polys[0].data, ct1.polys[1].data,
                    ct2.polys[0].data, ct2.polys[1].data)
    basis = ctx.basis()
    return Ciphertext(tuple(dcrt.make_poly(basis, d, Format.EVAL)
                            for d in (d0, d1, d2)), noise_deg=deg + 1)


# ---------------------------------------------------------------------------
# BEHZ multiplication variant (reference: BFVrns with
# MultiplicationTechnique BEHZ — FastBaseConvqToBskMontgomery /
# FastRNSFloorq / FastBaseConvSK, dcrtpoly-impl.h:2069-2380). Exact
# integer base conversions (Montgomery + Shenoy-Kumaresan) instead of
# HPS's fixed-point fraction estimates.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _behz_msk(ctx: BFVContext) -> int:
    """One extra NTT-friendly prime m_sk distinct from Q, R and P."""
    used = set(ctx.q_moduli) | set(ctx.r_moduli) | set(ctx.p_moduli)
    cursor = nbtheory.first_prime(59, 2 * ctx.n)
    while cursor in used:
        cursor = nbtheory.previous_prime(cursor, 2 * ctx.n)
    return cursor


@lru_cache(maxsize=None)
def _mult_pipeline_behz(ctx: BFVContext):
    """Jitted BEHZ EvalMult core: Q residues -> exact Bsk extension ->
    tensor in Q+Bsk -> t/Q flooring in Bsk -> exact switch back to Q."""
    qm = ctx.q_moduli
    bm = ctx.r_moduli               # reuse the extension primes as B
    m_sk = _behz_msk(ctx)
    bsk = bm + (m_sk,)
    full = qm + bsk
    t = ctx.t
    q_basis = ctx.basis()
    full_basis = RnsBasis(ctx.n, full)
    L, k1 = len(qm), len(bsk)

    from ..ops.modular import add_mod, make_mod_consts, mul_mod, \
        mul_mod_shoup, shoup_precon_int
    from ..ops.limb import from_int_array as _fia
    t_q = _fia(np.asarray([[t % q] for q in qm], dtype=object))
    t_q_pre = _fia(np.asarray([[shoup_precon_int(t % q, q)] for q in qm],
                              dtype=object))
    t_b = _fia(np.asarray([[t % b] for b in bsk], dtype=object))
    t_b_pre = _fia(np.asarray([[shoup_precon_int(t % b, b)] for b in bsk],
                              dtype=object))
    q_mod = make_mod_consts(qm, trailing_dims=1)
    b_mod = make_mod_consts(bsk, trailing_dims=1)

    def lift(x_eval: U64) -> U64:
        """EVAL over Q -> EVAL over Q+Bsk (exact Montgomery mod-up)."""
        x_coeff = ntt_ops.inverse(q_basis.plan, x_eval)
        conv = rns.base_conv_q_to_bsk_montgomery(x_coeff, qm, bsk)
        lo = jax.numpy.concatenate([x_coeff.lo, conv.lo], axis=0)
        hi = jax.numpy.concatenate([x_coeff.hi, conv.hi], axis=0)
        return ntt_ops.forward(full_basis.plan, U64(lo, hi))

    def scale_back(y_eval: U64) -> U64:
        """EVAL over Q+Bsk -> EVAL over Q: floor(t*Y/Q) via Bsk, exact
        Shenoy-Kumaresan switch back."""
        y_coeff = ntt_ops.inverse(full_basis.plan, y_eval)
        y_q = U64(y_coeff.lo[:L], y_coeff.hi[:L])
        y_b = U64(y_coeff.lo[L:], y_coeff.hi[L:])
        ty_q = mul_mod_shoup(y_q, t_q, t_q_pre, q_mod.q)
        ty_b = mul_mod_shoup(y_b, t_b, t_b_pre, b_mod.q)
        fl = rns.rns_floor_q(ty_q, ty_b, qm, bsk)
        out = rns.base_conv_sk(fl, bm, m_sk, qm)
        return ntt_ops.forward(q_basis.plan, out)

    @jax.jit
    def fn(c10, c11, c20, c21):
        l10, l11, l20, l21 = lift(c10), lift(c11), lift(c20), lift(c21)
        fmod = full_basis.mod
        d0 = mul_mod(l10, l20, fmod)
        d1 = add_mod(mul_mod(l10, l21, fmod), mul_mod(l11, l20, fmod),
                     fmod.q)
        d2 = mul_mod(l11, l21, fmod)
        return scale_back(d0), scale_back(d1), scale_back(d2)

    return fn


def eval_mult_behz(ctx: BFVContext, ct1: Ciphertext, ct2: Ciphertext
                   ) -> Ciphertext:
    assert len(ct1.polys) == 2 and len(ct2.polys) == 2
    fn = _mult_pipeline_behz(ctx)
    d0, d1, d2 = fn(ct1.polys[0].data, ct1.polys[1].data,
                    ct2.polys[0].data, ct2.polys[1].data)
    basis = ctx.basis()
    return Ciphertext(tuple(dcrt.make_poly(basis, d, Format.EVAL)
                            for d in (d0, d1, d2)),
                      noise_deg=max(ct1.noise_deg, ct2.noise_deg) + 1)


def relinearize(ct: Ciphertext, evk: keyswitch.KSKey) -> Ciphertext:
    assert len(ct.polys) == 3
    d0, d1 = keyswitch.apply(evk, ct.polys[2])
    return Ciphertext((dcrt.add(ct.polys[0], d0),
                       dcrt.add(ct.polys[1], d1)),
                      noise_deg=ct.noise_deg)


def eval_mult_relin(ctx: BFVContext, ct1: Ciphertext, ct2: Ciphertext,
                    evk: keyswitch.KSKey) -> Ciphertext:
    return relinearize(eval_mult(ctx, ct1, ct2), evk)


def eval_automorphism(ct: Ciphertext, k: int,
                      rot_key: keyswitch.KSKey) -> Ciphertext:
    """Hoisted order (decompose, then permute the digit stack) — see
    ckks.eval_rotate for the TPU gather-into-NTT fusion rationale."""
    assert len(ct.polys) == 2
    digits = keyswitch.hoist_decompose(rot_key.params, ct.polys[1])
    c0 = dcrt.automorphism(ct.polys[0], k)
    d0, d1 = keyswitch.hoist_rotate_apply(rot_key, digits, ct.basis, k)
    return Ciphertext((dcrt.add(c0, d0), d1))


def eval_add_plain(ctx: BFVContext, ct: Ciphertext,
                   values: Sequence[int]) -> Ciphertext:
    pt = encode(ctx, values)
    return Ciphertext((dcrt.add(ct.polys[0], pt),) + ct.polys[1:])


def eval_mult_plain(ctx: BFVContext, ct: Ciphertext,
                    values: Sequence[int]) -> Ciphertext:
    """Multiply by an UNSCALED packed plaintext (no Delta factor)."""
    coeffs = encoding.packed_encode(values, ctx.n, ctx.t)
    basis = ctx.basis()
    rows = sampling.signed_to_rns_rows(coeffs, basis.moduli)
    pt = dcrt.to_eval(dcrt.from_int_rows(basis, rows, Format.COEFF))
    return Ciphertext(tuple(dcrt.mul(p, pt) for p in ct.polys))


def rotation_galois(n: int, r: int) -> int:
    """Galois element for a packed-slot row rotation by r: 5^r mod 2n
    (reference: EvalAtIndex -> FindAutomorphismIndex2n for BGV/BFV)."""
    return pow(5, r % (n // 2), 2 * n)


def eval_rotate(ct: Ciphertext, r: int, rot_key: keyswitch.KSKey
                ) -> Ciphertext:
    """Rotate both packed rows left by r (reference: EvalAtIndex)."""
    return eval_automorphism(ct, rotation_galois(ct.basis.n, r), rot_key)


def eval_flip_rows(ct: Ciphertext, key: keyswitch.KSKey) -> Ciphertext:
    """Swap the two packed rows (sigma_{2n-1})."""
    return eval_automorphism(ct, 2 * ct.basis.n - 1, key)


def sum_galois_indices(n: int) -> list:
    """Galois elements for eval_sum's rotation tree + the row flip
    (reference: EvalSumKeyGen)."""
    return [rotation_galois(n, 1 << i)
            for i in range((n // 2).bit_length() - 1)] + [2 * n - 1]


def eval_sum(ct: Ciphertext, rot_keys) -> Ciphertext:
    """Every slot becomes the sum of ALL n slots (reference: EvalSum)."""
    n = ct.basis.n
    out = ct
    for i in range((n // 2).bit_length() - 1):
        k = rotation_galois(n, 1 << i)
        out = eval_add(out, eval_automorphism(out, k, rot_keys[k]))
    flip = 2 * n - 1
    return eval_add(out, eval_automorphism(out, flip, rot_keys[flip]))


def eval_inner_product(ctx: BFVContext, ct1: Ciphertext, ct2: Ciphertext,
                       evk: keyswitch.KSKey, rot_keys) -> Ciphertext:
    """<ct1, ct2> over all slots, replicated (reference: EvalInnerProduct)."""
    return eval_sum(eval_mult_relin(ctx, ct1, ct2, evk), rot_keys)
