"""Hybrid (RNS-digit) key switching — the workhorse of relinearization,
rotation, and conjugation.

Re-designs the reference's ``KeySwitchHYBRID``
(``pke/lib/keyswitch/keyswitch-hybrid.cpp:330-482``) for TPU execution:

* The full modulus chain Q = q_0..q_{L-1} is partitioned into ``dnum``
  digits of ``alpha`` towers. A switching key for target secret s' holds,
  per digit j, a pair (b_j, a_j) over the extended basis Q*P with
  b_j = -a_j s + e_j + [P * QHat_j * (QHat_j^{-1} mod D_j)] * s',
  where D_j = prod of digit-j moduli and QHat_j = Q/D_j. Because
  QHat_j * (QHat_j^{-1} mod D_j) ≡ 1 mod every q_i in D_j and ≡ 0 mod every
  q_i outside D_j (and P ≡ 0 mod every special prime), a single key
  generated at full level switches correctly at EVERY level with plain
  restriction decomposition — no per-level key material.

* Applying the switch to a polynomial c over Q_l (EVAL): one iNTT; per
  active digit, an ApproxSwitchCRTBasis into the complementary basis and a
  forward NTT over Q_l*P; an inner product with the key digits (general
  variable*variable mulmod, summed mod each tower); then two ApproxModDown
  (one per output component) and NTTs back. All tower math is batched
  [towers, n] array code — the reference's per-tower OpenMP loops become
  one VPU program per op.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dcrt import Format, RnsBasis, RnsPoly, make_poly
from .ops import ntt as ntt_ops
from .ops import rns
from .ops.limb import U64, from_int_array
from .ops.modular import (add_mod, add_mod32, mul_mod, mul_mod32,
                          mul_mod_shoup, mul_mod_shoup32, shoup_precon_int,
                          sub_mod, sub_mod32)
from .utils import sampling


@dataclasses.dataclass(frozen=True)
class KSParams:
    """Static hybrid-keyswitch geometry (hashable; closed over by jit)."""

    n: int
    q_moduli: Tuple[int, ...]
    p_moduli: Tuple[int, ...]
    alpha: int  # towers per digit
    plaintext_correction: int = 1  # t for BGV (mod-down lift ≡ 0 mod t)

    @property
    def dnum(self) -> int:
        return -(-len(self.q_moduli) // self.alpha)

    def digit_range(self, j: int, level_towers: int) -> Tuple[int, int]:
        """Active tower index range [start, end) of digit j at a level."""
        start = j * self.alpha
        end = min((j + 1) * self.alpha, level_towers)
        return start, end

    def num_digits(self, level_towers: int) -> int:
        return -(-level_towers // self.alpha)

    @property
    def P(self) -> int:
        prod = 1
        for p in self.p_moduli:
            prod *= p
        return prod


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KSKey:
    """Switching key: stacked digit pairs over Q*P, each [dnum, L+K, n]."""

    b_lo: jax.Array
    b_hi: jax.Array
    a_lo: jax.Array
    a_hi: jax.Array
    params: KSParams = dataclasses.field(metadata=dict(static=True))

    @property
    def b(self) -> U64:
        return U64(self.b_lo, self.b_hi)

    @property
    def a(self) -> U64:
        return U64(self.a_lo, self.a_hi)


@lru_cache(maxsize=None)
def _digit_factor_table(params: KSParams):
    """[dnum, L+K, 1] per-tower constants [P*QHat_j*(QHat_j^{-1} mod D_j)]_m
    with Shoup precons (host-exact)."""
    qs, ps = params.q_moduli, params.p_moduli
    Q = 1
    for q in qs:
        Q *= q
    all_moduli = qs + ps
    rows = []
    pre_rows = []
    for j in range(params.dnum):
        s, e = j * params.alpha, min((j + 1) * params.alpha, len(qs))
        D = 1
        for q in qs[s:e]:
            D *= q
        qhat = Q // D
        u = pow(qhat % D, -1, D)
        g = params.P * qhat * u
        row = [g % m for m in all_moduli]
        rows.append([[v] for v in row])
        pre_rows.append([[shoup_precon_int(v, m)] for v, m in zip(row, all_moduli)])
    shape = (params.dnum, len(all_moduli), 1)
    vals = from_int_array(np.asarray(rows, dtype=object).reshape(shape))
    pres = from_int_array(np.asarray(pre_rows, dtype=object).reshape(shape))
    return vals, pres


def ext_basis(params: KSParams, level_towers: int) -> RnsBasis:
    return RnsBasis(params.n,
                    params.q_moduli[:level_towers] + params.p_moduli)


def full_basis(params: KSParams) -> RnsBasis:
    return ext_basis(params, len(params.q_moduli))


def keygen(params: KSParams, s_from: RnsPoly, s_to: RnsPoly,
           rng: np.random.Generator, sigma: float = 3.19,
           error_scale: int = 1) -> KSKey:
    """Generate a switching key s_to -> s_from. Both secrets are EVAL-form
    RnsPolys over the full extended basis Q*P. error_scale multiplies the
    sampled error (t for BGV keys, 1 otherwise).

    (Reference role: KeySwitchHYBRID::KeySwitchGenInternal.)
    """
    basis = full_basis(params)
    a_datas = []
    for _ in range(params.dnum):
        a_rows = sampling.uniform_rns_rows(params.n, basis.moduli, rng)
        a_datas.append(rns_poly_from_rows(basis, a_rows, Format.EVAL).data)
    return keygen_with_a(params, s_from, s_to, a_datas, rng, sigma,
                         error_scale)


def keygen_with_a(params: KSParams, s_from: RnsPoly, s_to: RnsPoly,
                  a_datas, rng: np.random.Generator, sigma: float = 3.19,
                  error_scale: int = 1) -> KSKey:
    """keygen against caller-provided per-digit `a` components — the
    common-randomness primitive of the interactive multiparty protocol
    (reference: MultiKeySwitchGen, base-multiparty.cpp, which reuses the
    a-vector of a prior party's eval key)."""
    basis = full_basis(params)
    assert s_from.basis == basis and s_to.basis == basis
    n = params.n
    moduli = basis.moduli
    fac, fac_pre = _digit_factor_table(params)
    # one stacked [dnum, L+K, n] dispatch for all digits (the per-digit
    # dispatch loop dominated keygen wall time through the remote tunnel)
    e_np = np.stack([np.asarray(sampling.signed_to_rns_rows(
        sampling.gaussian_coeffs(n, rng, sigma) * error_scale, moduli))
        for _ in range(params.dnum)])
    e_coeff = from_int_array(e_np)
    a = U64(jnp.stack([d.lo for d in a_datas]),
            jnp.stack([d.hi for d in a_datas]))
    b = _digit_b_fn(basis)(a, e_coeff, s_from.data, s_to.data, fac, fac_pre)
    return KSKey(b.lo, b.hi, a.lo, a.hi, params)


def keygen_batch(params: KSParams, s_from: RnsPoly, s_enc_list,
                 rng: np.random.Generator, sigma: float = 3.19,
                 error_scale: int = 1) -> list:
    """Batch-generate switching keys for MANY encrypted secrets sharing
    one target secret, in ONE device dispatch.

    s_from is the shared target (the key ciphertexts decrypt under after
    switching); s_enc_list the per-key encrypted secrets (e.g. the
    automorphism images of s for a set of rotations). The per-key loop in
    ``keygen`` costs dnum dispatches + host->device transfers each — at
    bootstrap scale (dozens of rotation keys x 2^16 ring) that dominates
    keygen time through the remote tunnel; here the whole set is one
    [K, dnum, L, n] jit. (Reference role: the EvalAtIndexKeyGen /
    EvalBootstrapKeyGen rotation-key loops.)
    """
    basis = full_basis(params)
    assert s_from.basis == basis
    K = len(s_enc_list)
    n, moduli, dnum = params.n, basis.moduli, params.dnum
    a_np = np.stack([np.stack([
        np.asarray(sampling.uniform_rns_rows(n, moduli, rng))
        for _ in range(dnum)]) for _ in range(K)])          # [K, dnum, L, n]
    e_np = np.stack([np.stack([
        np.asarray(sampling.signed_to_rns_rows(
            sampling.gaussian_coeffs(n, rng, sigma) * error_scale, moduli))
        for _ in range(dnum)]) for _ in range(K)])
    a = from_int_array(a_np)
    e_coeff = from_int_array(e_np)
    s_enc = U64(jnp.stack([s.data.lo for s in s_enc_list])[:, None],
                jnp.stack([s.data.hi for s in s_enc_list])[:, None])
    fac, fac_pre = _digit_factor_table(params)
    b = _digit_b_batch_fn(basis)(a, e_coeff, s_enc, s_from.data,
                                 fac, fac_pre)
    return [KSKey(b.lo[k], b.hi[k], a.lo[k], a.hi[k], params)
            for k in range(K)]


@lru_cache(maxsize=None)
def _digit_b_batch_fn(basis: RnsBasis):
    """Jitted batched b = f_j s_enc + e - a s_target over [K, dnum, L, n]."""
    mod = basis.mod

    @jax.jit
    def fn(a, e_coeff, s_enc, s_target, fac, fac_pre):
        e = ntt_ops.forward(basis.plan, e_coeff)
        if basis.is_u32:
            m32 = basis.mod32
            gterm = mul_mod_shoup32(s_enc.lo, fac.lo, fac_pre.hi, m32.q)
            a_s = mul_mod32(a.lo, s_target.lo, m32)
            out = sub_mod32(add_mod32(gterm, e.lo, m32.q), a_s, m32.q)
            return U64(out, jnp.zeros_like(out))
        gterm = mul_mod_shoup(s_enc, fac, fac_pre, mod.q)
        a_s = mul_mod(a, s_target, mod)
        return sub_mod(add_mod(gterm, e, mod.q), a_s, mod.q)

    return fn


def key_a_datas(key: KSKey):
    """The per-digit a components, for reuse by the next party."""
    return [U64(key.a_lo[j], key.a_hi[j]) for j in range(key.params.dnum)]


def add_keys_b(k1: KSKey, k2: KSKey) -> KSKey:
    """Sum the b components of two keys sharing the same a
    (reference: MultiAddEvalKeys)."""
    basis = full_basis(k1.params)
    b = add_mod(U64(k1.b_lo, k1.b_hi), U64(k2.b_lo, k2.b_hi), basis.mod.q)
    return KSKey(b.lo, b.hi, k1.a_lo, k1.a_hi, k1.params)


def add_keys_full(k1: KSKey, k2: KSKey) -> KSKey:
    """Sum both components (reference: MultiAddEvalMultKeys)."""
    basis = full_basis(k1.params)
    b = add_mod(U64(k1.b_lo, k1.b_hi), U64(k2.b_lo, k2.b_hi), basis.mod.q)
    a = add_mod(U64(k1.a_lo, k1.a_hi), U64(k2.a_lo, k2.a_hi), basis.mod.q)
    return KSKey(b.lo, b.hi, a.lo, a.hi, k1.params)


def scale_key_by_share(key: KSKey, s_share: RnsPoly,
                       rng: np.random.Generator, sigma: float = 3.19,
                       error_scale: int = 1) -> KSKey:
    """(s_i * b_j + e0, s_i * a_j + e1) per digit — one party's
    contribution to the joint relinearization key
    (reference: MultiMultEvalKey). error_scale multiplies the noise
    (t for BGV, matching keygen)."""
    params = key.params
    basis = full_basis(params)
    assert s_share.basis == basis and s_share.fmt == Format.EVAL
    n = params.n
    moduli = basis.moduli

    def noisy(x: U64) -> U64:
        rows = np.stack([sampling.signed_to_rns_rows(
            sampling.gaussian_coeffs(n, rng, sigma) * error_scale, moduli)
            for _ in range(params.dnum)])
        e = ntt_ops.forward(basis.plan, from_int_array(rows))
        return add_mod(mul_mod(x, s_share.data, basis.mod), e, basis.mod.q)

    b = noisy(U64(key.b_lo, key.b_hi))
    a = noisy(U64(key.a_lo, key.a_hi))
    return KSKey(b.lo, b.hi, a.lo, a.hi, params)


@lru_cache(maxsize=None)
def _digit_b_fn(basis: RnsBasis):
    """Jitted b_j = -a s + e + f_j s' computation, cached per basis (a fresh
    closure per keygen call would recompile on every rotation key)."""
    mod = basis.mod

    @jax.jit
    def digit_b(a_data, e_coeff_data, s_from_data, s_to_data, fj, fj_pre):
        e = ntt_ops.forward(basis.plan, e_coeff_data)
        if basis.is_u32:
            m32 = basis.mod32
            gterm = mul_mod_shoup32(s_to_data.lo, fj.lo, fj_pre.hi, m32.q)
            a_s = mul_mod32(a_data.lo, s_from_data.lo, m32)
            out = sub_mod32(add_mod32(gterm, e.lo, m32.q), a_s, m32.q)
            return U64(out, jnp.zeros_like(out))
        gterm = mul_mod_shoup(s_to_data, fj, fj_pre, mod.q)
        a_s = mul_mod(a_data, s_from_data, mod)
        return sub_mod(add_mod(gterm, e, mod.q), a_s, mod.q)

    return digit_b


def rns_poly_from_rows(basis: RnsBasis, rows, fmt: Format) -> RnsPoly:
    data = from_int_array(rows)
    return make_poly(basis, data, fmt)


def hoist_decompose(params: KSParams, c: RnsPoly) -> U64:
    """Phase 1 of the hybrid switch — the expensive digit decomposition +
    mod-up, hoisted so it can be shared across many rotations of the same
    ciphertext: returns the digit stack [ndig, lvl+K, n] in EVAL form over
    Q_l*P.

    (Reference role: EvalKeySwitchPrecomputeCore /
    EvalFastRotationPrecompute, ``keyswitch-hybrid.cpp:330-413``.)
    """
    assert c.fmt == Format.EVAL
    lvl = c.basis.L
    q_act = params.q_moduli[:lvl]
    assert c.basis.moduli == q_act, "ciphertext basis must be a Q prefix"
    ndig = params.num_digits(lvl)
    eb = ext_basis(params, lvl)

    from . import dcrt as _dcrt

    c_coeff = _dcrt.ntt_inverse_data(c.basis, c.data)  # [lvl, n]
    rows_lo, rows_hi = [], []
    for j in range(ndig):
        s, e = params.digit_range(j, lvl)
        part = U64(c_coeff.lo[s:e], c_coeff.hi[s:e])
        part_moduli = q_act[s:e]
        comp_moduli = q_act[:s] + q_act[e:] + params.p_moduli
        conv = rns.approx_switch_basis(part, part_moduli, comp_moduli)
        # assemble rows in basis order [q_0..q_{lvl-1}, P]
        rows_lo.append(jnp.concatenate([conv.lo[:s], part.lo, conv.lo[s:]],
                                       axis=0))
        rows_hi.append(jnp.concatenate([conv.hi[:s], part.hi, conv.hi[s:]],
                                       axis=0))
    # one batched [ndig, lvl+K, n] forward NTT instead of ndig separate ones
    stacked = U64(jnp.stack(rows_lo), jnp.stack(rows_hi))
    return _dcrt.ntt_forward_data(eb, stacked)


def hoist_inner_product(key: KSKey, digits: U64, basis: RnsBasis
                        ) -> Tuple[RnsPoly, RnsPoly]:
    """Phase 2 — inner product of a (possibly automorphism-permuted) digit
    stack with the key, then mod-down by P.  ``basis`` is the ciphertext's
    Q_l basis.

    (Reference role: EvalFastKeySwitchCoreExt -> EvalFastKeySwitchCore,
    ``keyswitch-hybrid.cpp:416-482``.)
    """
    params = key.params
    lvl = basis.L
    q_act = params.q_moduli[:lvl]
    ndig = params.num_digits(lvl)
    eb = ext_basis(params, lvl)
    K = len(params.p_moduli)
    Lfull = len(params.q_moduli)

    # active rows of the key: q_0..q_{lvl-1} then the P block — selected
    # with SLICES (not a fancy-index gather: XLA materializes a gather of
    # the whole key per digit otherwise)
    def rows(arr):
        if lvl == Lfull:
            return arr
        return jnp.concatenate([arr[:lvl], arr[Lfull:]], axis=0)

    if eb.is_u32:
        # single-limb inner product: key/digit hi planes are identically
        # zero under the reduced-residue contract and never touched.
        m32 = eb.mod32
        a0 = a1 = None
        for j in range(ndig):
            dj = digits.lo[j]
            t0 = mul_mod32(dj, rows(key.b_lo[j]), m32)
            t1 = mul_mod32(dj, rows(key.a_lo[j]), m32)
            if a0 is None:
                a0, a1 = t0, t1
            else:
                a0 = add_mod32(a0, t0, m32.q)
                a1 = add_mod32(a1, t1, m32.q)
        z = jnp.zeros_like(a0)
        acc0, acc1 = U64(a0, z), U64(a1, z)
    else:
        acc0 = acc1 = None
        for j in range(ndig):
            digit = U64(digits.lo[j], digits.hi[j])
            kb = U64(rows(key.b_lo[j]), rows(key.b_hi[j]))
            ka = U64(rows(key.a_lo[j]), rows(key.a_hi[j]))
            t0 = mul_mod(digit, kb, eb.mod)
            t1 = mul_mod(digit, ka, eb.mod)
            if acc0 is None:
                acc0, acc1 = t0, t1
            else:
                acc0 = add_mod(acc0, t0, eb.mod.q)
                acc1 = add_mod(acc1, t1, eb.mod.q)

    # mod-down by P: coeff domain, split Q/P parts
    from . import dcrt as _dcrt

    def mod_down(acc: U64) -> U64:
        cc = _dcrt.ntt_inverse_data(eb, acc)
        xq = U64(cc.lo[:lvl], cc.hi[:lvl])
        xp = U64(cc.lo[lvl:], cc.hi[lvl:])
        down = rns.approx_mod_down(xq, xp, q_act, params.p_moduli,
                                   params.plaintext_correction)
        return _dcrt.ntt_forward_data(basis, down)

    d0 = make_poly(basis, mod_down(acc0), Format.EVAL)
    d1 = make_poly(basis, mod_down(acc1), Format.EVAL)
    return d0, d1


def apply(key: KSKey, c: RnsPoly) -> Tuple[RnsPoly, RnsPoly]:
    """Key-switch EVAL-form c over Q_l: returns (d0, d1) over Q_l (EVAL)
    such that d0 + d1*s ≈ c*s_to (the caller adds d0/d1 into the ct).

    (Reference stack: KeySwitchCore -> EvalKeySwitchPrecomputeCore ->
    EvalFastKeySwitchCoreExt -> EvalFastKeySwitchCore,
    ``keyswitch-hybrid.cpp:324-482``.)
    """
    digits = hoist_decompose(key.params, c)
    return hoist_inner_product(key, digits, c.basis)


def hoist_rotate_apply(key: KSKey, digits: U64, basis: RnsBasis,
                       galois_k: int) -> Tuple[RnsPoly, RnsPoly]:
    """Apply the automorphism sigma_k to a hoisted digit stack (one slot
    gather over [ndig, lvl+K, n]) and inner-product with the rotation key
    (reference: EvalFastRotation applying AutomorphismTransform to the
    precomputed digits)."""
    from .ops import automorph
    eb = ext_basis(key.params, basis.L)
    if eb.is_u32:
        lo = automorph.apply_eval_array(digits.lo, basis.n, galois_k)
        rotated = U64(lo, jnp.zeros_like(lo))
    else:
        rotated = automorph.apply_eval(digits, basis.n, galois_k)
    return hoist_inner_product(key, rotated, basis)


apply = jax.jit(apply)
hoist_decompose = jax.jit(hoist_decompose, static_argnums=0)
hoist_inner_product = jax.jit(hoist_inner_product, static_argnums=2)
hoist_rotate_apply = jax.jit(hoist_rotate_apply, static_argnums=(2, 3))


# ---------------------------------------------------------------------------
# BV key switching (digit decomposition per tower, no special primes).
# Reference: KeySwitchBV (``pke/lib/keyswitch/keyswitch-bv.cpp``) built on
# DCRTPoly::BaseDecompose / PowersOfBase (``dcrtpoly-impl.h:252,323``).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BVKSParams:
    n: int
    q_moduli: Tuple[int, ...]
    log_base: int  # relinearization window r (digits in base 2^r)

    def num_digits(self, tower: int) -> int:
        return -(-self.q_moduli[tower].bit_length() // self.log_base)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BVKSKey:
    """Per (tower i, digit d): RLWE pair over full Q encrypting
    B^d * delta_i * s_to, stacked [sum_digits, 2, L, n]."""

    b_lo: jax.Array
    b_hi: jax.Array
    a_lo: jax.Array
    a_hi: jax.Array
    params: BVKSParams = dataclasses.field(metadata=dict(static=True))


def bv_keygen(params: BVKSParams, s_from: RnsPoly, s_to: RnsPoly,
              rng: np.random.Generator, sigma: float = 3.19,
              error_scale: int = 1) -> BVKSKey:
    """s_from/s_to are EVAL over the full Q basis (no extension)."""
    basis = RnsBasis(params.n, params.q_moduli)
    assert s_from.basis == basis and s_to.basis == basis
    mod = basis.mod
    L = len(params.q_moduli)
    B = 1 << params.log_base
    digit_b = _digit_b_fn(basis)
    fac_rows, pre_rows = [], []
    for i in range(L):
        for d in range(params.num_digits(i)):
            f = [(pow(B, d, q) if j == i else 0)
                 for j, q in enumerate(params.q_moduli)]
            fac_rows.append([[v] for v in f])
            pre_rows.append([[shoup_precon_int(v, q)]
                             for v, q in zip(f, params.q_moduli)])
    total = len(fac_rows)
    fac = from_int_array(np.asarray(fac_rows, dtype=object))
    pre = from_int_array(np.asarray(pre_rows, dtype=object))
    b_list, a_list = [], []
    for k in range(total):
        a_rows = sampling.uniform_rns_rows(params.n, basis.moduli, rng)
        a = rns_poly_from_rows(basis, a_rows, Format.EVAL)
        e_rows = sampling.signed_to_rns_rows(
            sampling.gaussian_coeffs(params.n, rng, sigma) * error_scale,
            basis.moduli)
        e_coeff = from_int_array(e_rows)
        fj = U64(fac.lo[k], fac.hi[k])
        fj_pre = U64(pre.lo[k], pre.hi[k])
        b = digit_b(a.data, e_coeff, s_from.data, s_to.data, fj, fj_pre)
        b_list.append(b)
        a_list.append(a.data)
    return BVKSKey(jnp.stack([b.lo for b in b_list]),
                   jnp.stack([b.hi for b in b_list]),
                   jnp.stack([a.lo for a in a_list]),
                   jnp.stack([a.hi for a in a_list]), params)


def bv_apply(key: BVKSKey, c: RnsPoly) -> Tuple[RnsPoly, RnsPoly]:
    """Per-tower base-2^r digit decomposition inner product with the key.

    (Reference: KeySwitchBV::KeySwitchCore; BaseDecompose semantics —
    digits are the plain base-B limbs of each tower residue, broadcast to
    every tower since digit < B < q_j.)
    """
    params = key.params
    assert c.fmt == Format.EVAL
    lvl = c.basis.L
    assert c.basis.moduli == params.q_moduli[:lvl]
    mod = c.basis.mod
    plan = c.basis.plan
    B_mask = (1 << params.log_base) - 1
    c_coeff = ntt_ops.inverse(plan, c.data)  # [lvl, n]

    acc0 = acc1 = None
    row = 0
    for i in range(len(params.q_moduli)):
        nd = params.num_digits(i)
        if i >= lvl:
            row += nd
            continue
        xi = U64(c_coeff.lo[i], c_coeff.hi[i])  # [n]
        for d in range(nd):
            from .ops.limb import shr64
            assert params.log_base <= 32
            shifted = shr64(xi, d * params.log_base)
            dig = U64(shifted.lo & jnp.uint32(B_mask),
                      jnp.zeros_like(shifted.hi))
            # broadcast digit (value < B < every q_j) across towers
            dig_rows = U64(jnp.broadcast_to(dig.lo[None, :], (lvl, dig.lo.shape[0])),
                           jnp.broadcast_to(dig.hi[None, :], (lvl, dig.hi.shape[0])))
            dig_eval = ntt_ops.forward(plan, dig_rows)
            kb = U64(key.b_lo[row][:lvl], key.b_hi[row][:lvl])
            ka = U64(key.a_lo[row][:lvl], key.a_hi[row][:lvl])
            t0 = mul_mod(dig_eval, kb, mod)
            t1 = mul_mod(dig_eval, ka, mod)
            if acc0 is None:
                acc0, acc1 = t0, t1
            else:
                acc0 = add_mod(acc0, t0, mod.q)
                acc1 = add_mod(acc1, t1, mod.q)
            row += 1
    d0 = make_poly(c.basis, acc0, Format.EVAL)
    d1 = make_poly(c.basis, acc1, Format.EVAL)
    return d0, d1


bv_apply = jax.jit(bv_apply)
