"""BINFHE: FHEW/TFHE-style boolean gates with CGGI (GINX) blind rotation.

Covers the reference's binfhe module (``src/binfhe/``): LWE encryption
(``lwe-pke.cpp``), RGSW accumulator blind rotation
(``rgsw-acc-cggi.cpp:59-153``), gate bootstrapping with test-vector
rotation, sample extraction, LWE key switching and modulus switching
(``binfhe-base-scheme.cpp:71-122``).

TPU-first realization: the n sequential blind-rotation steps run under
``lax.scan`` with the bootstrapping key as a stacked [n, 2, 2*dg, 2, N]
tensor; each step is one batched NTT of the signed-digit decomposition, a
tower-broadcast multiply-accumulate against the key slab, a monomial
multiply via a precomputed [2N, N] evaluation table (one dynamic gather),
and one inverse NTT. Everything vectorizes over a batch axis, so many
gates bootstrap in parallel (amortizing the sequential depth — the TPU
answer to the reference's single-gate OpenMP parallelism).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ntt as ntt_ops
from ..ops.limb import U64
from ..ops.modular import add_mod, mul_mod, mul_mod_shoup, sub_mod
from ..utils import nbtheory, sampling


@dataclasses.dataclass(frozen=True)
class BinFHEParams:
    """Named parameter set (role of the reference's BINFHE_PARAMSET
    TOY..STD256Q_4, ``binfhe-constants-impl.cpp`` /
    ``binfhecontext.cpp:118-146``)."""

    n_lwe: int          # LWE dimension (reference: latticeParam)
    N: int              # ring dimension of the accumulator (cyclOrder / 2)
    Q: int              # accumulator modulus (NTT prime)
    q_ks: int           # LWE key-switch modulus (reference: modKS)
    log_bg: int         # gadget base log (reference gadgetBase, power of 2)
    log_bks: int = 0    # power-of-two key-switch base log (use base_ks else)
    sigma: float = 3.19
    method: str = "GINX"   # blind-rotation strategy: GINX (CGGI), AP (DM),
    #                        or LMKCDEY
    log_br: int = 3        # AP refresh base log (use base_r for non-pow2)
    q_gate: int = 0        # gate/LWE modulus (reference: mod); 0 -> 2N
    base_ks: int = 0       # arbitrary key-switch base (reference baseKS can
    #                        be 25...); 0 -> 1 << log_bks
    base_r: int = 0        # arbitrary AP refresh base (reference baseRK can
    #                        be 23, 32, 46); 0 -> 1 << log_br
    key_dist: str = "TERNARY"  # secret distribution: TERNARY or GAUSSIAN
    num_auto_keys: int = 1     # reference numAutoKeys (this LMKCDEY design
    #                            uses a fixed window of 1; kept for parity)

    @property
    def q(self) -> int:
        """Gate/LWE ciphertext modulus. Must divide 2N (the blind-rotation
        exponent modulus); the reference's sets use q = N or q = 2N."""
        return self.q_gate if self.q_gate else 2 * self.N

    @property
    def dg(self) -> int:
        return -(-self.Q.bit_length() // self.log_bg)

    @property
    def B_ks(self) -> int:
        return self.base_ks if self.base_ks else 1 << self.log_bks

    @property
    def d_ks(self) -> int:
        """Digits to cover q_ks - 1 in base B_ks (any base, any modulus)."""
        d, x = 0, self.q_ks - 1
        while x:
            d += 1
            x //= self.B_ks
        return d

    @property
    def B_r(self) -> int:
        return self.base_r if self.base_r else 1 << self.log_br

    @property
    def d_r(self) -> int:
        """AP digit count: B_r^d_r >= 2N (exponent modulus)."""
        d, x = 0, 2 * self.N - 1
        while x:
            d += 1
            x //= self.B_r
        return d


def toy_params() -> BinFHEParams:
    Q = nbtheory.first_prime(27, 2 * 256)
    return BinFHEParams(n_lwe=32, N=256, Q=Q, q_ks=1 << 14,
                        log_bg=10, log_bks=5, sigma=3.19)


# Reference named parameter sets, constants verbatim from
# ``binfhecontext.cpp:118-146`` (GenerateBinFHEContext's paramsMap):
# (numberBits, cyclOrder, latticeParam n, mod q, modKS (0 = the NTT prime Q),
#  baseKS, gadgetBase, baseRK, numAutoKeys, keyDist, default method).
# These are published standard constants the framework must match exactly.
_REF_TABLE = {
    "TOY_REF":           (27, 1024, 64, 512, 0, 25, 1 << 9, 23, 9,
                          "TERNARY", "GINX"),
    "MEDIUM":            (28, 2048, 422, 1024, 1 << 14, 1 << 7, 1 << 10, 32,
                          10, "TERNARY", "GINX"),
    "STD128_LMKCDEY":    (28, 2048, 446, 1024, 1 << 13, 1 << 5, 1 << 10, 32,
                          10, "GAUSSIAN", "LMKCDEY"),
    "STD128_AP":         (27, 2048, 503, 1024, 1 << 14, 1 << 5, 1 << 9, 32,
                          10, "TERNARY", "AP"),
    "STD128":            (27, 2048, 503, 1024, 1 << 14, 1 << 5, 1 << 9, 32,
                          10, "TERNARY", "GINX"),
    "STD192":            (37, 4096, 805, 1024, 1 << 15, 32, 1 << 13, 32,
                          10, "TERNARY", "GINX"),
    "STD256":            (29, 4096, 990, 2048, 1 << 14, 1 << 7, 1 << 8, 46,
                          10, "TERNARY", "GINX"),
    "STD128Q":           (25, 2048, 534, 1024, 1 << 14, 32, 1 << 7, 32,
                          10, "TERNARY", "GINX"),
    "STD128Q_LMKCDEY":   (27, 2048, 448, 1024, 1 << 13, 32, 1 << 9, 32,
                          10, "GAUSSIAN", "LMKCDEY"),
    "STD192Q":           (35, 4096, 875, 1024, 1 << 15, 32, 1 << 12, 32,
                          10, "TERNARY", "GINX"),
    "STD256Q":           (27, 4096, 1225, 1024, 1 << 16, 16, 1 << 7, 32,
                          10, "TERNARY", "GINX"),
    "STD128_3":          (27, 2048, 541, 1024, 1 << 15, 32, 1 << 7, 32,
                          10, "TERNARY", "GINX"),
    "STD128_3_LMKCDEY":  (28, 2048, 485, 1024, 1 << 15, 32, 1 << 10, 32,
                          10, "GAUSSIAN", "LMKCDEY"),
    "STD128Q_3":         (50, 4096, 575, 2048, 1 << 15, 32, 1 << 25, 32,
                          10, "TERNARY", "GINX"),
    "STD128Q_3_LMKCDEY": (27, 2048, 524, 1024, 1 << 15, 32, 1 << 9, 32,
                          10, "GAUSSIAN", "LMKCDEY"),
    "STD192Q_3":         (34, 4096, 922, 2048, 1 << 16, 16, 1 << 12, 32,
                          10, "TERNARY", "GINX"),
    "STD256Q_3":         (27, 4096, 1400, 4096, 1 << 16, 21, 1 << 6, 32,
                          10, "TERNARY", "GINX"),
    "STD128_4":          (27, 2048, 541, 2048, 1 << 15, 32, 1 << 7, 32,
                          10, "TERNARY", "GINX"),
    "STD128_4_LMKCDEY":  (28, 2048, 522, 2048, 1 << 15, 32, 1 << 10, 32,
                          10, "GAUSSIAN", "LMKCDEY"),
    "STD128Q_4":         (50, 4096, 647, 2048, 1 << 16, 16, 1 << 25, 32,
                          10, "TERNARY", "GINX"),
    "STD128Q_4_LMKCDEY": (27, 2048, 524, 2048, 1 << 15, 32, 1 << 7, 32,
                          10, "GAUSSIAN", "LMKCDEY"),
    "STD192Q_4":         (34, 4096, 980, 2048, 1 << 17, 16, 1 << 12, 32,
                          10, "TERNARY", "GINX"),
    "STD256Q_4":         (27, 4096, 1625, 4096, 1 << 21, 16, 1 << 6, 32,
                          10, "TERNARY", "GINX"),
    "SIGNED_MOD_TEST":   (28, 2048, 512, 1024, 0, 25, 1 << 7, 23,
                          10, "TERNARY", "GINX"),
}


def reference_params(name: str, method: str | None = None) -> BinFHEParams:
    """Build a named set with the reference's exact constants. The NTT
    prime Q is derived as PreviousPrime(FirstPrime(bits, 2N), 2N), matching
    ``binfhecontext.cpp:148-150``. ``method`` overrides the set's default
    blind-rotation strategy (the reference passes it separately)."""
    (bits, cyc, n, q, mod_ks, base_ks, base_g, base_r, n_auto, dist,
     meth) = _REF_TABLE[name]
    N = cyc // 2
    Q = nbtheory.previous_prime(nbtheory.first_prime(bits, cyc), cyc)
    if mod_ks == 0:      # reference PRIME sentinel: key-switch at Q itself
        mod_ks = Q
    return BinFHEParams(
        n_lwe=n, N=N, Q=Q, q_ks=mod_ks, log_bg=base_g.bit_length() - 1,
        sigma=3.19, method=method or meth, q_gate=q, base_ks=base_ks,
        base_r=base_r, key_dist=dist, num_auto_keys=n_auto)


def std128_params() -> BinFHEParams:
    return reference_params("STD128")


def toy_lp_params() -> BinFHEParams:
    """Toy set sized for the large-precision ops (EvalFloor/Sign/Decomp):
    lower sigma and fewer keyswitch digits so the noise stays below the
    q/4 chunk margin at N=256 (the reference's STD128+ sets achieve the
    same margin with N >= 1024)."""
    return dataclasses.replace(toy_params(), log_bks=7, sigma=1.0)


def toy_ap_params() -> BinFHEParams:
    return dataclasses.replace(toy_params(), method="AP", log_br=3)


def toy_lmk_params() -> BinFHEParams:
    return dataclasses.replace(toy_params(), method="LMKCDEY")


def std128_ap_params() -> BinFHEParams:
    return reference_params("STD128_AP")


# TOY/TOY_* are this framework's fast test-tuned sets; every other name is
# the reference's production table (constants exact, see _REF_TABLE).
PARAM_SETS = {"TOY": toy_params, "STD128": std128_params,
              "TOY_LP": toy_lp_params,
              "TOY_AP": toy_ap_params, "STD128_AP": std128_ap_params,
              "TOY_LMKCDEY": toy_lmk_params}
PARAM_SETS.update({name: (lambda n=name: reference_params(n))
                   for name in _REF_TABLE if name not in PARAM_SETS})


class LWECiphertext(NamedTuple):
    """(a, b) over modulus q: phase = b - <a, s> encodes m * q/4."""
    a: np.ndarray  # int64 [n]
    b: int
    modulus: int


@dataclasses.dataclass
class BinFHESecret:
    s_lwe: np.ndarray    # ternary [n_lwe]
    z_ring: np.ndarray   # ternary [N] (accumulator ring secret)


@dataclasses.dataclass
class BootstrapKey:
    """CGGI key: ek[i, sign] = RGSW(bit) under the ring secret, stacked, plus
    the LWE key-switch key from ring-coefficients to the LWE secret."""

    ek_lo: jax.Array      # [n, 2, 2*dg, 2, N] uint32
    ek_hi: jax.Array
    ks_a: jax.Array       # [N, d_ks, B_ks, n] int32  (mod q_ks)
    ks_b: jax.Array       # [N, d_ks, B_ks] int32


# ---------------------------------------------------------------------------
# Context
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BinFHEContext:
    params: BinFHEParams

    @property
    def plan(self):
        return ntt_ops.make_plan(self.params.N, (self.params.Q,))


def gen_context(name_or_params="STD128") -> BinFHEContext:
    p = PARAM_SETS[name_or_params]() if isinstance(name_or_params, str) \
        else name_or_params
    if p.Q.bit_length() > 59:
        # The general mul_mod path carries 60-bit moduli; the two-limb
        # signed gadget decompose shifts 64-bit two's-complement limbs.
        raise ValueError(
            f"accumulator modulus Q ({p.Q.bit_length()} bits) exceeds the "
            "59-bit limit of the limb kernels")
    if p.Q.bit_length() > 30 and p.method != "GINX":
        # The AP slab gather and the LMKCDEY automorphism keyswitch still
        # center-lift in int32; every reference AP/LMKCDEY set fits. The
        # Q >= 2^31 production sets (STD192*, STD128Q_3/4) are all GINX.
        raise ValueError(
            f"method {p.method} supports Q < 2^31 only (use GINX for "
            f"{p.Q.bit_length()}-bit Q)")
    if (2 * p.N) % p.q != 0:
        raise ValueError("gate modulus q must divide 2N")
    return BinFHEContext(p)


def keygen(ctx: BinFHEContext, rng: np.random.Generator) -> BinFHESecret:
    """(role of BinFHEContext::KeyGen; GAUSSIAN keyDist mirrors
    LWEEncryptionScheme::KeyGenGaussian, lwe-pke.cpp:53-57)."""
    p = ctx.params
    if p.key_dist == "GAUSSIAN":
        # CGGI's double-key construction encodes s_i in {-1,0,1} indicator
        # bits; Gaussian secrets need the monomial-based methods.
        assert p.method in ("LMKCDEY", "AP"), \
            "GAUSSIAN secrets require the LMKCDEY or AP method"
        return BinFHESecret(sampling.gaussian_coeffs(p.n_lwe, rng, p.sigma),
                            sampling.gaussian_coeffs(p.N, rng, p.sigma))
    return BinFHESecret(sampling.ternary_coeffs(p.n_lwe, rng),
                        sampling.ternary_coeffs(p.N, rng))


def encrypt(ctx: BinFHEContext, sk: BinFHESecret, bit: int,
            rng: np.random.Generator) -> LWECiphertext:
    """LWE encrypt bit at q/4 (reference: LWEEncryptionScheme::Encrypt)."""
    p = ctx.params
    q = p.q
    a = rng.integers(0, q, size=p.n_lwe, dtype=np.int64)
    e = int(np.rint(rng.normal(0, p.sigma)))
    b = (int(a @ sk.s_lwe) + e + bit * (q // 4)) % q
    return LWECiphertext(a, b, q)


def decrypt(ctx: BinFHEContext, sk: BinFHESecret,
            ct: LWECiphertext) -> int:
    q = ct.modulus
    phase = (ct.b - int(ct.a @ sk.s_lwe)) % q
    return int(((4 * phase + q // 2) // q) % 4) & 1


# ---------------------------------------------------------------------------
# Public-key LWE (reference: LWEEncryptionScheme::KeyGenPair / PubKeyGen /
# EncryptN, lwe-pke.cpp:59-111,153-194; surfaced as BinFHEContext::
# KeyGenPair + Encrypt-with-public-key, binfhecontext.h:189)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LWEPublicKey:
    """(A, v = A z + e) over the accumulator modulus Q at ring dimension N;
    z is the ring secret viewed as an LWE key (the reference's skN)."""
    A: np.ndarray   # int64 [N, N] mod Q
    v: np.ndarray   # int64 [N]


def _matvec_mod(A: np.ndarray, x: np.ndarray, mod: int,
                block: int = 128) -> np.ndarray:
    """(A @ x) % mod with block-wise reduction so int64 never overflows:
    entries reduced mod `mod` stay < 2^31, products < 2^55 against
    |x_j| < 2^24, and 128 such terms < 2^62 fit int64. Moduli at or above
    2^31 (the STD192*/STD128Q_* accumulator primes) fall back to exact
    Python-int math."""
    if int(mod).bit_length() > 31:
        return ((A.astype(object) @ x.astype(object)) % mod).astype(np.int64)
    acc = np.zeros(A.shape[0], dtype=np.int64)
    for s in range(0, A.shape[1], block):
        acc = (acc + (A[:, s:s + block] * x[s:s + block]).sum(axis=1)) % mod
    return acc


def pubkey_gen(ctx: BinFHEContext, sk: BinFHESecret,
               rng: np.random.Generator) -> LWEPublicKey:
    """(role of LWEEncryptionScheme::PubKeyGen, lwe-pke.cpp:81-111)."""
    p = ctx.params
    N, Q = p.N, p.Q
    A = rng.integers(0, Q, size=(N, N), dtype=np.int64)
    e = np.rint(rng.normal(0, p.sigma, size=N)).astype(np.int64)
    v = (_matvec_mod(A, sk.z_ring, Q) + e) % Q
    return LWEPublicKey(A, v)


def keygen_pair(ctx: BinFHEContext, rng: np.random.Generator
                ) -> Tuple[LWEPublicKey, BinFHESecret]:
    """(role of BinFHEContext::KeyGenPair / LWE KeyGenPair,
    lwe-pke.cpp:59-79): secret (s_lwe, z_ring) plus a public key bound to
    the ring secret z_ring."""
    sk = keygen(ctx, rng)
    return pubkey_gen(ctx, sk, rng), sk


def encrypt_pk(ctx: BinFHEContext, pk: LWEPublicKey, m: int,
               rng: np.random.Generator, p_msg: int = 4) -> LWECiphertext:
    """Public-key LWE encryption at dimension N, modulus Q (reference:
    EncryptN, lwe-pke.cpp:153-194): a = A^T s' + e', b = <v, s'> + e'' +
    m * Q/p. Use switch_ct_to_qn to get a gate-ready (q, n) ciphertext."""
    p = ctx.params
    N, Q = p.N, p.Q
    sp = sampling.ternary_coeffs(N, rng)
    ep = np.rint(rng.normal(0, p.sigma, size=N)).astype(np.int64)
    a = (_matvec_mod(pk.A.T, sp, Q) + ep) % Q
    e2 = int(np.rint(rng.normal(0, p.sigma)))
    b = (int(_matvec_mod(pk.v[None, :], sp, Q)[0]) + e2
         + (m % p_msg) * (Q // p_msg)) % Q
    return LWECiphertext(a, b, Q)


def switch_ct_to_qn(ctx: BinFHEContext, bk: BootstrapKey,
                    ct: LWECiphertext) -> LWECiphertext:
    """Convert a dimension-N, modulus-Q ciphertext (public-key encryption)
    to the gate format: dimension n_lwe, modulus q (reference:
    LWEEncryptionScheme::SwitchCTtoqn, lwe-pke.cpp:196-205)."""
    p = ctx.params
    assert len(ct.a) == p.N, "input must be at ring dimension N"
    ct1 = _mod_switch_lwe(ct, p.q_ks)
    # _lwe_keyswitch_batch consumes the extract-path convention
    # phase = b + <a, z>; this ciphertext is phase = b - <a, z>.
    a_neg = (-np.asarray(ct1.a, np.int64)) % p.q_ks
    a_out, b_out = _lwe_keyswitch_batch(
        ctx, bk.ks_a, bk.ks_b, a_neg[None, :],
        np.asarray([ct1.b], np.int64))
    ct2 = LWECiphertext(a_out[0], int(b_out[0]), p.q_ks)
    return _mod_switch_lwe(ct2, p.q)


# ---------------------------------------------------------------------------
# Bootstrapping key generation
# ---------------------------------------------------------------------------


def _rlwe_encrypt_batch(ctx, z_eval: U64, msgs_eval: U64, shape,
                        rng) -> Tuple[U64, U64]:
    """Batch RLWE encryptions under ring secret z: returns (c0, c1) with
    phase c0 + c1*z = msg + e. All arrays [*shape, N] over single modulus."""
    p = ctx.params
    N, Q = p.N, p.Q
    from ..ops.limb import from_int_array
    a_rows = rng.integers(0, Q, size=(*shape, N), dtype=np.uint64)
    a = from_int_array(a_rows)
    e_rows = (np.rint(rng.normal(0, p.sigma, size=(*shape, N)))
              .astype(np.int64) % Q).astype(np.uint64)
    e_coeff = from_int_array(e_rows)
    return _rlwe_batch_jit(ctx, shape)(a, e_coeff, z_eval, msgs_eval)


@lru_cache(maxsize=None)
def _rlwe_batch_jit(ctx: BinFHEContext, shape):
    plan = ctx.plan
    mod = _scalar_mod(ctx)

    @jax.jit
    def fn(a, e_coeff, z_eval, msgs_eval):
        e = _ntt_nd(plan, e_coeff)
        az = mul_mod(a, z_eval, mod)
        c0 = add_mod(sub_mod(e, az, mod.q), msgs_eval, mod.q)
        return c0, a

    return fn


@lru_cache(maxsize=None)
def _scalar_mod(ctx: BinFHEContext):
    from ..ops.modular import make_mod_consts
    return make_mod_consts((ctx.params.Q,), trailing_dims=0)


def _ntt_nd(plan, x: U64) -> U64:
    """NTT over the last axis for arbitrary leading batch shape."""
    shape = x.lo.shape
    flat = U64(x.lo.reshape(-1, shape[-1]), x.hi.reshape(-1, shape[-1]))
    # plan tables are [1, N]; broadcasting handles [B, N]
    out = ntt_ops.forward(plan, flat)
    return U64(out.lo.reshape(shape), out.hi.reshape(shape))


def _intt_nd(plan, x: U64) -> U64:
    shape = x.lo.shape
    flat = U64(x.lo.reshape(-1, shape[-1]), x.hi.reshape(-1, shape[-1]))
    out = ntt_ops.inverse(plan, flat)
    return U64(out.lo.reshape(shape), out.hi.reshape(shape))


def _keyswitch_keygen(ctx: BinFHEContext, sk: BinFHESecret,
                      rng: np.random.Generator):
    """LWE key-switch key ring-coeffs -> s_lwe at q_ks (shared by all
    accumulator methods; reference: LWEEncryptionScheme::KeySwitchGen)."""
    p = ctx.params
    N, n = p.N, p.n_lwe
    q_ks, d_ks, B_ks = p.q_ks, p.d_ks, p.B_ks
    a_ks = rng.integers(0, q_ks, size=(N, d_ks, B_ks, n), dtype=np.int64)
    e_ks = np.rint(rng.normal(0, p.sigma, size=(N, d_ks, B_ks))).astype(np.int64)
    vals = np.arange(B_ks, dtype=np.int64)[None, None, :]
    powers = np.array([pow(B_ks, d, q_ks) for d in range(d_ks)], np.int64)
    targets = (vals * powers[None, :, None] % q_ks
               * sk.z_ring[:, None, None]) % q_ks
    b_ks = (np.einsum("jdvn,n->jdv", a_ks, sk.s_lwe) + e_ks + targets) % q_ks
    return (jnp.asarray(a_ks.astype(np.int32)),
            jnp.asarray(b_ks.astype(np.int32)))


def bootstrap_keygen(ctx: BinFHEContext, sk: BinFHESecret,
                     rng: np.random.Generator) -> BootstrapKey:
    """(role of BinFHEContext::BTKeyGen + RingGSWAccumulator*::KeyGenAcc;
    dispatches on the method like the reference's BINFHE_METHOD)."""
    if ctx.params.method == "AP":
        return _bootstrap_keygen_dm(ctx, sk, rng)
    if ctx.params.method == "LMKCDEY":
        return bootstrap_keygen_lmkcdey(ctx, sk, rng)
    assert ctx.params.method == "GINX", ctx.params.method
    return _bootstrap_keygen_cggi(ctx, sk, rng)


def _bootstrap_keygen_cggi(ctx: BinFHEContext, sk: BinFHESecret,
                           rng: np.random.Generator) -> BootstrapKey:
    """CGGI/GINX ternary-secret double keys (``rgsw-acc-cggi.cpp:40-57``)."""
    p = ctx.params
    N, Q, n, dg = p.N, p.Q, p.n_lwe, p.dg
    plan = ctx.plan
    from ..ops.limb import from_int_array

    z_rows = sampling.signed_to_rns_rows(sk.z_ring, (Q,))
    z_eval = ntt_ops.forward_jit(plan, from_int_array(z_rows))  # [1, N]
    z_flat = U64(z_eval.lo[0], z_eval.hi[0])

    # messages for RGSW rows: bit * B^d and bit * B^d * z  (eval domain)
    # ek[i][sign] encrypts bit = (s_i == +1) for sign 0, (s_i == -1) for 1.
    bits = np.stack([(sk.s_lwe == 1).astype(np.int64),
                     (sk.s_lwe == -1).astype(np.int64)], axis=1)  # [n, 2]
    powers = [(1 << (p.log_bg * d)) % Q for d in range(dg)]
    # msg tensor [n, 2, 2*dg, N] in EVAL: rows d<dg: bit*B^d (constant poly
    # -> eval = constant);  rows dg..: bit*B^d*z
    msgs_lo = np.zeros((n, 2, 2 * dg, N), np.uint32)
    msgs_hi = np.zeros((n, 2, 2 * dg, N), np.uint32)
    z_lo = np.asarray(z_flat.lo)
    z_hi = np.asarray(z_flat.hi)
    for d, Bd in enumerate(powers):
        for sign in range(2):
            sel = bits[:, sign].astype(bool)
            # constant poly Bd in eval domain is the constant vector Bd
            msgs_lo[sel, sign, d, :] = np.uint32(Bd & 0xFFFFFFFF)
            msgs_hi[sel, sign, d, :] = np.uint32(Bd >> 32)
    msgs = U64(jnp.asarray(msgs_lo), jnp.asarray(msgs_hi))
    # second half rows: multiply z in (shoup by constant would need tables;
    # use general mul against broadcast z)
    zb = U64(jnp.broadcast_to(z_flat.lo, (n, 2, dg, N)),
             jnp.broadcast_to(z_flat.hi, (n, 2, dg, N)))
    first = U64(msgs.lo[:, :, :dg], msgs.hi[:, :, :dg])
    second = mul_mod(first, zb, _scalar_mod(ctx))
    msgs_all = U64(jnp.concatenate([first.lo, second.lo], axis=2),
                   jnp.concatenate([first.hi, second.hi], axis=2))

    c0, c1 = _rlwe_encrypt_batch(ctx, z_eval, msgs_all, (n, 2, 2 * dg), rng)
    ek_lo = jnp.stack([c0.lo, c1.lo], axis=3)  # [n, 2, 2dg, 2, N]
    ek_hi = jnp.stack([c0.hi, c1.hi], axis=3)
    ks_a, ks_b = _keyswitch_keygen(ctx, sk, rng)
    return BootstrapKey(ek_lo, ek_hi, ks_a, ks_b)


def _bootstrap_keygen_dm(ctx: BinFHEContext, sk: BinFHESecret,
                         rng: np.random.Generator) -> BootstrapKey:
    """DM/AP accumulator key (role of RingGSWAccumulatorDM::KeyGenAcc,
    ``rgsw-acc-dm.cpp``): ek[i, j, v] = RGSW(X^{s_i * v * B_r^j}), so blind
    rotation multiplies one slab per (i, digit) step — value selection is a
    device gather instead of the reference's host-side branch over digits."""
    p = ctx.params
    N, Q, n, dg = p.N, p.Q, p.n_lwe, p.dg
    d_r, B_r = p.d_r, p.B_r
    plan = ctx.plan
    from ..ops.limb import from_int_array

    z_rows = sampling.signed_to_rns_rows(sk.z_ring, (Q,))
    z_eval = ntt_ops.forward_jit(plan, from_int_array(z_rows))  # [1, N]
    z_flat = U64(z_eval.lo[0], z_eval.hi[0])

    mono = _monomial_eval_np(ctx)                      # int64 [2N, N]
    s = sk.s_lwe.astype(np.int64)
    v = np.arange(B_r, dtype=np.int64)
    bpow = np.array([pow(B_r, j, 2 * N) for j in range(d_r)], np.int64)
    c = (s[:, None, None] * bpow[None, :, None] * v[None, None, :]) % (2 * N)
    M = n * d_r * B_r
    xc = mono[c.reshape(-1)]                           # [M, N] int64, < Q < 2^31
    powers = np.array([(1 << (p.log_bg * d)) % Q for d in range(dg)], np.int64)
    first_np = (xc[:, None, :] * powers[None, :, None]) % Q  # [M, dg, N]
    first = from_int_array(first_np.astype(np.uint64))
    zb = U64(jnp.broadcast_to(z_flat.lo, (M, dg, N)),
             jnp.broadcast_to(z_flat.hi, (M, dg, N)))
    second = mul_mod(first, zb, _scalar_mod(ctx))
    msgs_all = U64(jnp.concatenate([first.lo, second.lo], axis=1),
                   jnp.concatenate([first.hi, second.hi], axis=1))

    c0, c1 = _rlwe_encrypt_batch(ctx, z_eval, msgs_all, (M, 2 * dg), rng)
    ek_lo = jnp.stack([c0.lo, c1.lo], axis=2)          # [M, 2dg, 2, N]
    ek_hi = jnp.stack([c0.hi, c1.hi], axis=2)
    ek_lo = ek_lo.reshape(n * d_r, B_r, 2 * dg, 2, N)
    ek_hi = ek_hi.reshape(n * d_r, B_r, 2 * dg, 2, N)
    ks_a, ks_b = _keyswitch_keygen(ctx, sk, rng)
    return BootstrapKey(ek_lo, ek_hi, ks_a, ks_b)


# ---------------------------------------------------------------------------
# Blind rotation (the operation the fork's DPU NTT stub never delivered)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _monomial_eval_np(ctx: BinFHEContext) -> np.ndarray:
    """int64 [2N, N] eval-domain values of X^c for every exponent c
    (slot j evaluates at psi^(2*rev(j)+1))."""
    p = ctx.params
    N, Q = p.N, p.Q
    psi = nbtheory.root_of_unity(2 * N, Q)
    rev = ntt_ops.bit_reverse_perm(N)
    exps = ((2 * rev + 1) % (2 * N)).astype(np.int64)
    # psi powers with exact Python ints (pw * psi overflows int64 once
    # Q crosses 2^31; values themselves stay < Q < 2^63)
    acc = 1
    pw = np.empty(2 * N, dtype=np.int64)
    for i in range(2 * N):
        pw[i] = acc
        acc = acc * psi % Q
    idx = (np.arange(2 * N, dtype=np.int64)[:, None] * exps[None, :]) % (2 * N)
    return pw[idx]


@lru_cache(maxsize=None)
def _monomial_table(ctx: BinFHEContext) -> U64:
    """[2N, N] eval-domain values of (X^c - 1) for every exponent c."""
    Q = ctx.params.Q
    table = (_monomial_eval_np(ctx) - 1) % Q
    from ..ops.limb import from_int_array
    return from_int_array(table.astype(np.uint64))


def _make_signed_decompose(p: BinFHEParams):
    """[B, 2, N] coeff -> [B, 2*dg, N] signed gadget digits as residues
    mod Q (shared by the CGGI and DM external products; reference:
    ``rgsw-acc.h:86-98`` SignedDigitDecompose). Q < 2^31 runs in int32
    lanes; wider Q (STD192*, STD128Q_3/4 go up to 50 bits) runs the same
    recurrence on two's-complement uint32 limb pairs."""
    N, Q, dg, logB = p.N, p.Q, p.dg, p.log_bg
    half_Q = Q // 2
    B = 1 << logB
    halfB = B // 2

    def signed_decompose32(acc_coeff: U64):
        v = acc_coeff.lo
        # centered lift in int32 (Q < 2^31)
        signed = jnp.where(v > jnp.uint32(half_Q),
                           v.astype(jnp.int32) - jnp.int32(Q),
                           v.astype(jnp.int32))
        digits = []
        for _ in range(dg):
            r = ((signed + halfB) & (B - 1)) - halfB
            signed = (signed - r) >> logB
            digits.append(r)
        d = jnp.stack(digits, axis=2)  # [B, 2, dg, N]
        d = d.reshape(d.shape[0], 2 * dg, N)
        lo = jnp.where(d < 0, (d + Q).astype(jnp.uint32), d.astype(jnp.uint32))
        return U64(lo, jnp.zeros_like(lo))

    def signed_decompose_wide(acc_coeff: U64):
        from ..ops import limb
        # centered lift: v - Q mod 2^64 IS the two's-complement encoding
        q64 = limb.from_int(Q)
        big = limb.geq64(acc_coeff, limb.from_int(half_Q + 1))
        val = limb.select64(big, limb.sub64(acc_coeff, q64), acc_coeff)
        lo, hi = val.lo, val.hi
        digits = []
        for _ in range(dg):
            # digit depends only on the low limb (B divides 2^32)
            r = (((lo.astype(jnp.int32) + halfB) & (B - 1)) - halfB)
            # val = (val - r) >> logB, arithmetic on the limb pair
            r_lo = r.astype(jnp.uint32)
            r_hi = (r >> 31).astype(jnp.uint32)        # sign extension
            v2 = limb.sub64(U64(lo, hi), U64(r_lo, r_hi))
            lo = (v2.lo >> logB) | (v2.hi << (32 - logB))
            hi = (v2.hi.astype(jnp.int32) >> logB).astype(jnp.uint32)
            digits.append(r)
        d = jnp.stack(digits, axis=2)                  # [B, 2, dg, N] int32
        d = d.reshape(d.shape[0], 2 * dg, N)
        # residue mod Q: r >= 0 -> (r, 0); r < 0 -> Q - |r| in limbs
        mag = jnp.where(d < 0, -d, d).astype(jnp.uint32)
        q_lo = np.uint32(Q & 0xFFFFFFFF)
        q_hi = np.uint32(Q >> 32)
        borrow = (q_lo < mag).astype(jnp.uint32)
        neg_lo = q_lo - mag
        neg_hi = q_hi - borrow
        lo_out = jnp.where(d < 0, neg_lo, mag)
        hi_out = jnp.where(d < 0, neg_hi, jnp.uint32(0))
        return U64(lo_out, hi_out)

    return signed_decompose32 if Q.bit_length() <= 30 else \
        signed_decompose_wide


@lru_cache(maxsize=None)
def _blind_rotate_fn(ctx: BinFHEContext):
    """Jitted scan over the n_lwe CGGI accumulator updates."""
    p = ctx.params
    N, Q, dg, logB = p.N, p.Q, p.dg, p.log_bg
    plan = ctx.plan
    mod = _scalar_mod(ctx)
    _mono = _monomial_table(ctx)
    mono = U64(jnp.asarray(_mono.lo), jnp.asarray(_mono.hi))
    signed_decompose = _make_signed_decompose(p)

    def step(acc_coeff: U64, inputs):
        a_i, ek_lo_i, ek_hi_i = inputs  # [B], [2, 2dg, 2, N] x2
        for sign in range(2):
            digits = signed_decompose(acc_coeff)      # [B, 2dg, N]
            dct = _ntt_nd(plan, digits)               # [B, 2dg, N] eval
            key = U64(ek_lo_i[sign], ek_hi_i[sign])   # [2dg, 2, N]
            dx = U64(dct.lo[:, :, None, :], dct.hi[:, :, None, :])
            prod = mul_mod(dx, key, mod)              # [B, 2dg, 2, N]
            # sum over digit rows -> [B, 2, N]
            acc_ext = None
            for r in range(2 * dg):
                term = U64(prod.lo[:, r], prod.hi[:, r])
                acc_ext = term if acc_ext is None else \
                    add_mod(acc_ext, term, mod.q)
            # The rotation target is X^{b - sum a_i s_i}: the s_i = +1 key
            # (sign 0) rotates by X^{-a_i}, the s_i = -1 key by X^{+a_i}.
            c = jnp.where(jnp.int32(sign) == 0, (2 * N - a_i) % (2 * N), a_i)
            row = U64(mono.lo[c], mono.hi[c])         # [B, N]
            rotated = mul_mod(acc_ext, U64(row.lo[:, None, :],
                                           row.hi[:, None, :]), mod)
            delta = _intt_nd(plan, rotated)           # [B, 2, N] coeff
            acc_coeff = add_mod(acc_coeff, delta, mod.q)
        return acc_coeff, None

    @jax.jit
    def rotate(acc_init: U64, a_vec, ek_lo, ek_hi):
        # acc_init [B, 2, N]; a_vec [n, B]
        final, _ = jax.lax.scan(step, acc_init, (a_vec, ek_lo, ek_hi))
        return final

    return rotate


@lru_cache(maxsize=None)
def _blind_rotate_dm_fn(ctx: BinFHEContext):
    """Jitted scan over the n_lwe * d_r DM accumulator updates (role of
    RingGSWAccumulatorDM::EvalAcc + AddToAccDM, ``rgsw-acc-dm.cpp``): each
    step REPLACES acc by the external product acc (*) ek[i, j, digit],
    where digit is gathered per batch element on device."""
    p = ctx.params
    dg = p.dg
    plan = ctx.plan
    mod = _scalar_mod(ctx)
    signed_decompose = _make_signed_decompose(p)

    def step(acc_coeff: U64, inputs):
        dig, ek_lo_t, ek_hi_t = inputs  # [B] int32; [B_r, 2dg, 2, N] x2
        digits = signed_decompose(acc_coeff)          # [B, 2dg, N]
        dct = _ntt_nd(plan, digits)
        key = U64(jnp.take(ek_lo_t, dig, axis=0),
                  jnp.take(ek_hi_t, dig, axis=0))     # [B, 2dg, 2, N]
        dx = U64(dct.lo[:, :, None, :], dct.hi[:, :, None, :])
        prod = mul_mod(dx, key, mod)                  # [B, 2dg, 2, N]
        acc_ext = None
        for r in range(2 * dg):
            term = U64(prod.lo[:, r], prod.hi[:, r])
            acc_ext = term if acc_ext is None else \
                add_mod(acc_ext, term, mod.q)
        acc_coeff = _intt_nd(plan, acc_ext)           # [B, 2, N] coeff
        return acc_coeff, None

    @jax.jit
    def rotate(acc_init: U64, dig_all, ek_lo, ek_hi):
        # acc_init [B, 2, N]; dig_all [n*d_r, B]
        final, _ = jax.lax.scan(step, acc_init, (dig_all, ek_lo, ek_hi))
        return final

    return rotate


def _dm_digit_tensor(ctx: BinFHEContext, a_2n: np.ndarray) -> np.ndarray:
    """[n*d_r, B] base-B_r digits of (2N - a_i) mod 2N, so the product of
    the gathered slabs is X^{-sum a_i s_i}."""
    p = ctx.params
    neg = (2 * p.N - np.asarray(a_2n, dtype=np.int64) % (2 * p.N)) % (2 * p.N)
    rem = neg.T.copy()  # [n, B]
    digs = []
    for _ in range(p.d_r):
        digs.append(rem % p.B_r)
        rem //= p.B_r
    out = np.stack(digs, axis=1)  # [n, d_r, B]
    return out.reshape(p.n_lwe * p.d_r, -1).astype(np.int32)


@lru_cache(maxsize=None)
def _test_vector(ctx: BinFHEContext) -> np.ndarray:
    """Gate test polynomial tv = (-Q/8) * sum_j X^j.

    With w~ = phase mod 2N, const(tv * X^{w~}) = +Q/8 for w~ in (0, N]
    (the TRUE half) and -Q/8 otherwise; adding Q/8 maps to {Q/4, 0}.
    """
    p = ctx.params
    beta = p.Q // 8
    return np.full(p.N, p.Q - beta, dtype=object)


def _bootstrap_core(ctx: BinFHEContext, bk: BootstrapKey,
                    a_2n: np.ndarray, b_2n: np.ndarray):
    """Blind-rotate the test vector by the phase of each (a, b) mod 2N.
    a_2n: [B, n_lwe], b_2n: [B]. Returns accumulator U64 [B, 2, N] (coeff).
    """
    p = ctx.params
    N, Q = p.N, p.Q
    from ..ops.limb import from_int_array

    if p.method == "LMKCDEY":
        return _bootstrap_core_lmk(ctx, bk, a_2n, b_2n)
    tv = _test_vector(ctx)
    batch = len(b_2n)
    c0 = np.zeros((batch, N), dtype=object)
    for bi in range(batch):
        shift = int(b_2n[bi]) % (2 * N)
        for j in range(N):
            e = (j + shift) % (2 * N)
            if e < N:
                c0[bi, e] = (c0[bi, e] + tv[j]) % Q
            else:
                c0[bi, e - N] = (c0[bi, e - N] - tv[j]) % Q
    rows = np.zeros((batch, 2, N), dtype=object)
    rows[:, 0, :] = c0
    rows[:, 1, :] = 0
    acc = from_int_array(rows)
    return _run_blind_rotation(ctx, bk, acc, a_2n)


def _run_blind_rotation(ctx: BinFHEContext, bk: BootstrapKey, acc: U64,
                        a_2n: np.ndarray) -> U64:
    """Dispatch on the accumulator method (reference: the ACCscheme
    strategy object selected by BINFHE_METHOD)."""
    N = ctx.params.N
    if ctx.params.method == "AP":
        dig = jnp.asarray(_dm_digit_tensor(ctx, a_2n))
        return _blind_rotate_dm_fn(ctx)(acc, dig, bk.ek_lo, bk.ek_hi)
    a_dev = jnp.asarray((np.asarray(a_2n).T % (2 * N)).astype(np.int32))
    return _blind_rotate_fn(ctx)(acc, a_dev, bk.ek_lo, bk.ek_hi)


def _lwe_keyswitch_batch(ctx: BinFHEContext, ks_a, ks_b, a1: np.ndarray,
                         b1: np.ndarray):
    """LWE key switch dim N -> n_lwe at modulus q_ks (reference:
    LWEEncryptionScheme::KeySwitch, lwe-pke.cpp:200): digit-decompose each
    input coordinate in base B_ks and gather-accumulate key rows.
    a1: [B, N] mod q_ks, b1: [B]. Returns (a_out [B, n], b_out [B])."""
    p = ctx.params
    N, q_ks, B_ks = p.N, p.q_ks, p.B_ks
    digits = []
    rem = a1.copy()
    for d in range(p.d_ks):
        digits.append(rem % B_ks)
        rem //= B_ks
    digits = np.stack(digits, axis=2)  # [B, N, d_ks]
    ks_a = np.asarray(ks_a).astype(np.int64)  # [N, d_ks, B_ks, n]
    ks_b = np.asarray(ks_b).astype(np.int64)
    j_idx = np.arange(N)[None, :, None]
    d_idx = np.arange(p.d_ks)[None, None, :]
    sel_a = ks_a[j_idx, d_idx, digits]  # [B, N, d_ks, n]
    sel_b = ks_b[j_idx, d_idx, digits]  # [B, N, d_ks]
    # phase_in = b1 + sum_j a1_j z_j ≈ b1 + sum(sel_b) - <sum(sel_a), s>,
    # so in (a, b) convention: a_out = sum(sel_a), b_out = b1 + sum(sel_b)
    a_out = sel_a.sum(axis=(1, 2)) % q_ks       # [B, n]
    b_out = (b1 + sel_b.sum(axis=(1, 2))) % q_ks
    return a_out, b_out


def _extract_and_keyswitch(ctx: BinFHEContext, bk: BootstrapKey,
                           acc_coeff: U64) -> list:
    """Batched: sample-extract LWE(Q, N) from each accumulator, key-switch
    to the LWE secret at q_ks, mod-switch to q (reference:
    binfhe-base-scheme.cpp:118-122 -> lwe-pke.cpp:200). The + Q/8 offset
    maps the rotation halves to {0, Q/4}."""
    return _extract_and_keyswitch_offset(ctx, bk, acc_coeff,
                                         offset=ctx.params.Q // 8)


def bootstrap_raw_batch(ctx: BinFHEContext, bk: BootstrapKey, a_q, b_q
                        ) -> list:
    """Batched PBS of LWE samples at the gate modulus q: a_q [B, n],
    b_q [B]. q must divide 2N; exponents are scaled by 2N/q (reference:
    BootstrapGateCore's GetPolyModulus()/GetModulus() ratio)."""
    p = ctx.params
    M = 2 * p.N
    assert M % p.q == 0, "gate modulus must divide 2N"
    f = M // p.q
    a_2n = (np.asarray(a_q, dtype=np.int64) * f) % M
    b_2n = (np.asarray(b_q, dtype=np.int64) * f) % M
    acc = _bootstrap_core(ctx, bk, a_2n, b_2n)
    return _extract_and_keyswitch(ctx, bk, acc)


def bootstrap_raw(ctx: BinFHEContext, bk: BootstrapKey, a_q, b_q
                  ) -> LWECiphertext:
    return bootstrap_raw_batch(ctx, bk, np.asarray(a_q)[None, :],
                               np.asarray([b_q]))[0]


GATES = {
    "AND": (1, 1, -3, 8),   # w = ct1 + ct2 - 3q/8
    "OR": (1, 1, -1, 8),
    "NAND": (-1, -1, 3, 8),
    "NOR": (-1, -1, 1, 8),
}


def _gate_input(ctx, gate, ct1, ct2):
    q = ctx.params.q
    if gate in ("XOR", "XNOR"):
        a = (2 * (ct1.a - ct2.a)) % q
        b = (2 * (ct1.b - ct2.b) - 3 * q // 8) % q
        return a, b, gate == "XNOR"
    s1, s2, cnum, cden = GATES[gate]
    a = (s1 * ct1.a + s2 * ct2.a) % q
    b = (s1 * ct1.b + s2 * ct2.b + cnum * q // cden) % q
    return a, b, False


def eval_gate(ctx: BinFHEContext, gate: str, bk: BootstrapKey,
              ct1: LWECiphertext, ct2: LWECiphertext) -> LWECiphertext:
    """(role of BinFHEContext::EvalBinGate, ``binfhecontext.cpp:301``)."""
    return eval_gate_batch(ctx, gate, bk, [ct1], [ct2])[0]


def eval_gate_batch(ctx: BinFHEContext, gate: str, bk: BootstrapKey,
                    cts1: list, cts2: list) -> list:
    """Evaluate the same gate over a batch of input pairs with ONE blind
    rotation scan — the TPU-native way to amortize the sequential PBS."""
    inputs = [_gate_input(ctx, gate, c1, c2)
              for c1, c2 in zip(cts1, cts2)]
    a = np.stack([i[0] for i in inputs])
    b = np.asarray([i[1] for i in inputs])
    outs = bootstrap_raw_batch(ctx, bk, a, b)
    return [eval_not(ctx, o) if i[2] else o for o, i in zip(outs, inputs)]


def eval_not(ctx: BinFHEContext, ct: LWECiphertext) -> LWECiphertext:
    """NOT without bootstrapping (reference: EvalNOT)."""
    q = ct.modulus
    return LWECiphertext((-ct.a) % q, (q // 4 - ct.b) % q, q)


# Multi-input gates (reference: the ciphertext-vector EvalBinGate overload,
# ``binfhe-base-scheme.cpp:126-177``, gate constants
# ``rgsw-cryptoparameters.cpp:77-89``): arity, input plaintext modulus p
# (bits are encrypted at q/p — p=4 for MAJORITY like the 2-input gates,
# p=6 for 3-input AND3/OR3, p=8 for 4-input AND4/OR4; use encrypt_zp),
# and the additive phase offset cnum*q/cden aligning the TRUE sums with
# the test vector's (0, q/2] half. Unlike the reference (whose output
# keeps the input's q/p scale), the output here is normalized to the
# standard q/4 bit encoding, so multi-input outputs chain directly into
# 2-input gates.
MULTI_GATES = {
    "MAJORITY": (3, 4, -3, 8),
    "AND3": (3, 6, -5, 12),
    "OR3": (3, 6, -1, 12),
    "AND4": (4, 8, -7, 16),
    "OR4": (4, 8, -1, 16),
}


def eval_gate_vec(ctx: BinFHEContext, gate: str, bk: BootstrapKey,
                  cts: list) -> LWECiphertext:
    """Multi-input gate over a ciphertext vector (role of the reference's
    EvalBinGate(..., std::vector<LWECiphertext>) overload)."""
    return eval_gate_vec_batch(ctx, gate, bk, [cts])[0]


def eval_gate_vec_batch(ctx: BinFHEContext, gate: str, bk: BootstrapKey,
                        batches: list) -> list:
    """Batched multi-input gates: one blind-rotation scan for the whole
    batch. ``batches`` is a list of ciphertext lists, all the same gate."""
    if gate == "CMUX":
        return [eval_cmux(ctx, bk, *cts) for cts in batches]
    arity, _p, cnum, cden = MULTI_GATES[gate]
    q = ctx.params.q
    a_rows, b_rows = [], []
    for cts in batches:
        if len(cts) != arity:
            raise ValueError(f"{gate} takes exactly {arity} inputs")
        for i in range(len(cts)):
            for j in range(i + 1, len(cts)):
                if cts[i] is cts[j]:
                    raise ValueError(
                        "input ciphertexts must be independent "
                        "(reference: EvalBinGate config_error)")
        a = np.zeros_like(cts[0].a)
        b = 0
        for ct in cts:
            a = (a + ct.a) % q
            b = (b + ct.b) % q
        a_rows.append(a)
        b_rows.append((b + cnum * q // cden) % q)
    return bootstrap_raw_batch(ctx, bk, np.stack(a_rows),
                               np.asarray(b_rows))


def eval_cmux(ctx: BinFHEContext, bk: BootstrapKey, ct0: LWECiphertext,
              ct1: LWECiphertext, sel: LWECiphertext) -> LWECiphertext:
    """CMUX(d0, d1, sel) = d1 if sel else d0, via three NANDs (reference:
    binfhe-base-scheme.cpp:169-176): NAND(NAND(d0, NOT sel), NAND(d1, sel)).
    Inputs use the standard q/4 bit encoding."""
    not_sel = eval_not(ctx, sel)
    n1, n2 = eval_gate_batch(ctx, "NAND", bk, [ct0, ct1], [not_sel, sel])
    return eval_gate(ctx, "NAND", bk, n1, n2)


def bootstrap(ctx: BinFHEContext, bk: BootstrapKey,
              ct: LWECiphertext) -> LWECiphertext:
    """Refresh a (possibly noisy) ciphertext (reference: Bootstrap)."""
    q = ctx.params.q
    # w = 2*ct - q/8 maps {0, q/4} -> {-q/8, 3q/8}: output bit preserved
    a = (2 * ct.a) % q
    b = (2 * ct.b - q // 8) % q
    return bootstrap_raw(ctx, bk, a, b)


# ---------------------------------------------------------------------------
# Arbitrary-function bootstrapping over Z_p (role of BinFHEContext::EvalFunc
# for negacyclic LUTs, ``binfhe-base-scheme.cpp:241-349``)
# ---------------------------------------------------------------------------


def encrypt_zp(ctx: BinFHEContext, sk: BinFHESecret, m: int, p: int,
               rng: np.random.Generator) -> LWECiphertext:
    """LWE encrypt a message in Z_p at q/p (general message space)."""
    pp = ctx.params
    q = pp.q
    a = rng.integers(0, q, size=pp.n_lwe, dtype=np.int64)
    e = int(np.rint(rng.normal(0, pp.sigma)))
    b = (int(a @ sk.s_lwe) + e + (m * q) // p) % q
    return LWECiphertext(a, b, q)


def decrypt_zp(ctx: BinFHEContext, sk: BinFHESecret, ct: LWECiphertext,
               p: int) -> int:
    q = ct.modulus
    phase = (ct.b - int(ct.a @ sk.s_lwe)) % q
    return int(((p * phase + q // 2) // q) % p)


def eval_func(ctx: BinFHEContext, bk: BootstrapKey, ct: LWECiphertext,
              lut, p: int) -> LWECiphertext:
    """Programmable bootstrapping: out encrypts lut[m] for input message m,
    for NEGACYCLIC tables (lut[(m + p/2) % p] == -lut[m] mod p). The
    reference extends this to arbitrary functions with a two-stage PBS; the
    negacyclic core here is that building block."""
    pp = ctx.params
    N, Q, q = pp.N, pp.Q, pp.q
    half = p // 2
    for m in range(half):
        assert (lut[(m + half) % p] + lut[m]) % p == 0, \
            "lut must be negacyclic; compose eval_func twice otherwise"
    # const(tv * X^{w~}) = -t_{N-w~} for w~ in (0, N], +t_{2N-w~} above;
    # with w~ ~= m*2N/p both constraints reduce (via negacyclicity) to
    # t_k = f(p - k*p/(2N)) * Q/p.
    tv = np.zeros(N, dtype=object)
    for k in range(N):
        m_at = (p - int(np.rint(k * p / (2.0 * N)))) % p
        tv[k] = (lut[m_at] * Q // p) % Q
    f = (2 * N) // q     # exponent scale when the gate modulus q < 2N
    acc = _bootstrap_core_tv(ctx, bk,
                             (np.asarray(ct.a, np.int64) * f)[None, :] % (2 * N),
                             np.asarray([(ct.b * f) % (2 * N)]), tv)
    return _extract_and_keyswitch_offset(ctx, bk, acc, offset=0)[0]


def eval_sign(ctx: BinFHEContext, bk: BootstrapKey, ct: LWECiphertext,
              p: int) -> LWECiphertext:
    """Sign of a centered Z_p message: 1 for m in (0, p/2), p-1 for
    m in (p/2, p) (reference: EvalSign's single-digit core)."""
    lut = [0] + [1] * (p // 2 - 1) + [0] + [p - 1] * (p // 2 - 1)
    return eval_func(ctx, bk, ct, lut, p)


# ---------------------------------------------------------------------------
# Large-precision pipeline: EvalFloor / large EvalSign / EvalDecomp
# (reference: binfhe-base-scheme.cpp:316-354, 356-429, 431-483 — ciphertexts
# at a large power-of-two modulus are processed in log2(2N)-bit chunks via
# pairs of negacyclic phase-domain bootstraps)
# ---------------------------------------------------------------------------


def encrypt_phase(ctx: BinFHEContext, sk: BinFHESecret, value: int,
                  modulus: int, rng: np.random.Generator) -> LWECiphertext:
    """LWE encrypt a raw phase value at an arbitrary (power-of-two)
    modulus — the input format of the large-precision ops."""
    p = ctx.params
    a = rng.integers(0, modulus, size=p.n_lwe, dtype=np.int64)
    e = int(np.rint(rng.normal(0, p.sigma)))
    b = (int(a @ sk.s_lwe) + e + value) % modulus
    return LWECiphertext(a, b, modulus)


def decrypt_phase(ctx: BinFHEContext, sk: BinFHESecret,
                  ct: LWECiphertext) -> int:
    return int((ct.b - int(ct.a @ sk.s_lwe)) % ct.modulus)


def _bootstrap_phase_func(ctx: BinFHEContext, bk: BootstrapKey,
                          ct: LWECiphertext, f, out_mod: int
                          ) -> LWECiphertext:
    """PBS computing f(phase mod 2N) at output modulus out_mod, where f is
    negacyclic over [0, 2N): f(x + N) == -f(x) mod out_mod (reference:
    BootstrapFunc's test-vector construction). ct.modulus must be a
    multiple of 2N so truncation preserves the phase mod 2N."""
    p = ctx.params
    N, Q = p.N, p.Q
    assert ct.modulus % (2 * N) == 0, "modulus must be a multiple of 2N"
    for x in range(N):
        assert (f(x) + f(x + N)) % out_mod == 0, "f must be negacyclic"
    # tv_0 = f(0); tv_k = -f(N - k) for k in (0, N): then
    # const(tv * X^phase) = f(phase) for all phase in [0, 2N).
    tv = np.zeros(N, dtype=object)
    tv[0] = f(0) * Q // out_mod % Q
    for k in range(1, N):
        tv[k] = (-(f(N - k) * Q // out_mod)) % Q
    a_2n = np.asarray(ct.a, dtype=np.int64)[None, :] % (2 * N)
    b_2n = np.asarray([ct.b % (2 * N)])
    acc = _bootstrap_core_tv(ctx, bk, a_2n, b_2n, tv)
    return _extract_and_keyswitch_offset(ctx, bk, acc, offset=0,
                                         out_mod=out_mod)[0]


def eval_floor(ctx: BinFHEContext, bk: BootstrapKey, ct: LWECiphertext,
               beta: int) -> LWECiphertext:
    """Clear the low log2(2N) bits of the phase (reference: EvalFloor,
    binfhe-base-scheme.cpp:316-354): out ~ (m + beta) - ((m + beta) mod 2N)
    at the same large modulus. beta bounds the accumulated noise."""
    p = ctx.params
    q = 2 * p.N  # the per-round chunk modulus (reference's q)
    mod = ct.modulus
    ct1 = LWECiphertext(ct.a.copy(), (ct.b + beta) % mod, mod)

    # boot 1 (reference f1): +-q/4 depending on the half of (phase mod q)
    def f1(x):
        return (mod - (q >> 2)) if x < (q >> 1) else (q >> 2)

    ct2 = _bootstrap_phase_func(ctx, bk, ct1, f1, mod)
    ct1 = LWECiphertext((ct1.a - ct2.a) % mod, (ct1.b - ct2.b) % mod, mod)

    # boot 2 (reference f2): identity on the centered range, reflections
    # outside; subtracting it clears the low bits exactly
    def f2(x):
        if x < (q >> 2):
            return (mod - (q >> 1) - x) % mod
        if x < 3 * (q >> 2):
            return x
        return (mod + (q >> 1) - x) % mod

    ct3 = _bootstrap_phase_func(ctx, bk, ct1, f2, mod)
    return LWECiphertext((ct1.a - ct3.a) % mod, (ct1.b - ct3.b) % mod, mod)


def _mod_switch_lwe(ct: LWECiphertext, new_mod: int) -> LWECiphertext:
    """Rounding LWE modulus switch (reference: LWEEncryptionScheme::
    ModSwitch, lwe-pke.cpp:39)."""
    mod = ct.modulus
    a = ((np.asarray(ct.a, np.int64) * new_mod * 2 + mod) // (2 * mod)) % new_mod
    b = ((ct.b * new_mod * 2 + mod) // (2 * mod)) % new_mod
    return LWECiphertext(a, int(b), new_mod)


def eval_sign_large(ctx: BinFHEContext, bk: BootstrapKey,
                    ct: LWECiphertext, beta: int) -> LWECiphertext:
    """Large-precision sign (reference: EvalSign loop,
    binfhe-base-scheme.cpp:356-429): floor away low chunks until the
    modulus fits one PBS, then a final sign bootstrap. Returns an LWE at
    modulus 2N encrypting 0 if phase < modulus/2 else 1 (at scale q/2)."""
    p = ctx.params
    q = 2 * p.N
    mod = ct.modulus
    cttmp = ct
    while mod > q:
        cttmp = eval_floor(ctx, bk, cttmp, beta)
        mod = mod * 2 * beta // q
        cttmp = _mod_switch_lwe(cttmp, mod)
    if mod < q:  # scale up exactly (power-of-two factors)
        factor = q // mod
        cttmp = LWECiphertext((cttmp.a * factor) % q,
                              (cttmp.b * factor) % q, q)
    cttmp = LWECiphertext(cttmp.a, (cttmp.b + beta) % q, q)

    def f3(x):
        return (q >> 2) if x < (q >> 1) else (q - (q >> 2))

    out = _bootstrap_phase_func(ctx, bk, cttmp, f3, q)
    # phase is now +-q/4; shift to {q/2, 0} so decrypt_zp(..., p=2) reads it
    return LWECiphertext((-out.a) % q, ((q >> 2) - out.b) % q, q)


def eval_decomp(ctx: BinFHEContext, bk: BootstrapKey, ct: LWECiphertext,
                beta: int) -> list:
    """Digit decomposition of a large-precision phase (reference:
    EvalDecomp, binfhe-base-scheme.cpp:431-483). Returns LWE ciphertexts
    at modulus q = 2N: the first encrypts (phase mod q) directly; each
    subsequent digit encrypts the floored carry scaled by 2*beta."""
    p = ctx.params
    q = 2 * p.N
    mod = ct.modulus
    cttmp = ct
    out = []
    while mod > q:
        out.append(LWECiphertext(cttmp.a % q, cttmp.b % q, q))
        cttmp = eval_floor(ctx, bk, cttmp, beta)
        mod = mod * 2 * beta // q
        cttmp = _mod_switch_lwe(cttmp, mod)
    out.append(cttmp)
    return out


def _bootstrap_core_tv(ctx, bk, a_2n, b_2n, tv):
    """Like _bootstrap_core but with a caller-provided test polynomial."""
    p = ctx.params
    N, Q = p.N, p.Q
    from ..ops.limb import from_int_array
    if p.method == "LMKCDEY":
        return _bootstrap_core_lmk(ctx, bk, a_2n, b_2n, tv)
    batch = len(b_2n)
    c0 = np.zeros((batch, N), dtype=object)
    for bi in range(batch):
        shift = int(b_2n[bi]) % (2 * N)
        for j in range(N):
            e = (j + shift) % (2 * N)
            if e < N:
                c0[bi, e] = (c0[bi, e] + tv[j]) % Q
            else:
                c0[bi, e - N] = (c0[bi, e - N] - tv[j]) % Q
    rows = np.zeros((batch, 2, N), dtype=object)
    rows[:, 0, :] = c0
    acc = from_int_array(rows)
    return _run_blind_rotation(ctx, bk, acc, a_2n)


def _extract_and_keyswitch_offset(ctx, bk, acc_coeff, offset: int,
                                  out_mod: int | None = None):
    """_extract_and_keyswitch with a configurable post-extract offset
    (gate bootstrapping adds Q/8; LUT bootstrapping adds none) and output
    modulus (<= q_ks; large-precision ops keep the big modulus)."""
    p = ctx.params
    N, Q, q_ks, q = p.N, p.Q, p.q_ks, p.q
    if out_mod is not None:
        assert out_mod <= q_ks, "output modulus cannot exceed q_ks"
        q = out_mod
    lo = np.asarray(acc_coeff.lo).astype(np.int64)
    hi = np.asarray(acc_coeff.hi).astype(np.int64)
    vals = (hi << 32) | lo
    c0 = vals[:, 0, :]
    c1 = vals[:, 1, :]
    batch = c0.shape[0]
    b_N = (c0[:, 0] + offset) % Q
    a_N = np.concatenate([c1[:, :1], (-c1[:, :0:-1]) % Q], axis=1)
    if Q.bit_length() + q_ks.bit_length() + 1 > 62:
        # value * 2 * q_ks would overflow int64 (Q up to 50 bits in the
        # STD192*/STD128Q_* sets); round in exact Python ints instead
        b_N = b_N.astype(object)
        a_N = a_N.astype(object)
    b1 = (b_N * q_ks * 2 + Q) // (2 * Q) % q_ks
    a1 = ((a_N * q_ks * 2 + Q) // (2 * Q)) % q_ks
    if a1.dtype == object:
        b1 = b1.astype(np.int64)
        a1 = a1.astype(np.int64)
    a_out, b_out = _lwe_keyswitch_batch(ctx, bk.ks_a, bk.ks_b, a1, b1)
    b2 = (b_out * q * 2 + q_ks) // (2 * q_ks) % q
    a2 = ((a_out * q * 2 + q_ks) // (2 * q_ks)) % q
    return [LWECiphertext(a2[i], int(b2[i]), q) for i in range(batch)]


# ---------------------------------------------------------------------------
# LMKCDEY blind rotation (reference: rgsw-acc-lmkcdey.cpp, eprint 2022/198):
# n RGSW(X^{s_i}) keys + automorphism keys; rotation exponents are walked
# via the sigma_{5^k} orbit instead of per-index monomial keys.
#
# TPU realization: the reference's data-dependent permuteMap loop becomes a
# host-built FIXED schedule (op, key-index) per ciphertext, executed by one
# lax.scan whose step lax.switches between {external product, automorphism
# by g, automorphism by -g, no-op}. numAutoKeys is fixed at 1 (an
# automorphism after every exponent class), so the schedule length is
# static: 2*(N/2 - 1) + 1 autos + n externals.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LMKCDEYKey:
    ek_lo: jax.Array      # [n, 2dg, 2, N] RGSW(X^{s_i})
    ek_hi: jax.Array
    ak_lo: jax.Array      # [2, dg, 2, N]: 0 = sigma_g, 1 = sigma_{M-g}
    ak_hi: jax.Array
    ks_a: jax.Array       # LWE keyswitch (shared structure)
    ks_b: jax.Array


_LMK_GEN = 5


def _auto_perm_sign(N: int, t: int):
    """Coefficient-domain automorphism X^j -> X^{j t mod 2N}: returns
    (dst index [N], sign [N]) so out[dst[j]] = sign[j] * in[j]."""
    dst = np.zeros(N, dtype=np.int64)
    sgn = np.zeros(N, dtype=np.int64)
    for j in range(N):
        e = (j * t) % (2 * N)
        if e < N:
            dst[j], sgn[j] = e, 1
        else:
            dst[j], sgn[j] = e - N, -1
    return dst, sgn


def _apply_auto_np_free(rows: np.ndarray, t: int, Q: int) -> np.ndarray:
    """Host automorphism of object-int coeff rows [R, N] (for the free
    initial step where c1 = 0)."""
    R, N = rows.shape
    dst, sgn = _auto_perm_sign(N, t)
    out = np.zeros_like(rows)
    for j in range(N):
        if sgn[j] == 1:
            out[:, dst[j]] = rows[:, j]
        else:
            out[:, dst[j]] = (Q - rows[:, j]) % Q
    return out


def _lmk_dlog_table(N: int):
    """dlog base 5 over the odd residues of Z_2N: class +k for 5^k,
    -k for -5^k (k in [0, N/2)); returned as a dict."""
    M = 2 * N
    table = {}
    pw = 1
    for k in range(N // 2):
        table[pw] = k
        table[M - pw] = -k if k > 0 else M  # -1 gets the sentinel M
        pw = pw * _LMK_GEN % M
    return table


def bootstrap_keygen_lmkcdey(ctx: BinFHEContext, sk: BinFHESecret,
                             rng: np.random.Generator) -> LMKCDEYKey:
    """(role of RingGSWAccumulatorLMKCDEY::KeyGenAcc + KeyGenAuto.)"""
    p = ctx.params
    N, Q, n, dg = p.N, p.Q, p.n_lwe, p.dg
    M = 2 * N
    plan = ctx.plan
    from ..ops.limb import from_int_array

    z_rows = sampling.signed_to_rns_rows(sk.z_ring, (Q,))
    z_eval = ntt_ops.forward_jit(plan, from_int_array(z_rows))  # [1, N]
    z_flat = U64(z_eval.lo[0], z_eval.hi[0])

    # --- ek_i = RGSW(X^{s_i mod 2N}) (the DM slab construction at v=s_i)
    mono = _monomial_eval_np(ctx)
    c = (sk.s_lwe.astype(np.int64)) % M                    # [n]
    xc = mono[c]                                           # [n, N] int64
    powers = np.array([(1 << (p.log_bg * d)) % Q for d in range(dg)],
                      np.int64)
    first_np = (xc[:, None, :] * powers[None, :, None]) % Q   # [n, dg, N]
    first = from_int_array(first_np.astype(np.uint64))
    zb = U64(jnp.broadcast_to(z_flat.lo, (n, dg, N)),
             jnp.broadcast_to(z_flat.hi, (n, dg, N)))
    second = mul_mod(first, zb, _scalar_mod(ctx))
    msgs = U64(jnp.concatenate([first.lo, second.lo], axis=1),
               jnp.concatenate([first.hi, second.hi], axis=1))
    c0, c1 = _rlwe_encrypt_batch(ctx, z_eval, msgs, (n, 2 * dg), rng)
    ek_lo = jnp.stack([c0.lo, c1.lo], axis=2)              # [n, 2dg, 2, N]
    ek_hi = jnp.stack([c0.hi, c1.hi], axis=2)

    # --- automorphism keys for t in {g, M-g}: rows d encrypt
    # Bg^d * sigma_t(z): kc0 + kc1 * z = Bg^d sigma_t(z) + e
    ak_lo_list, ak_hi_list = [], []
    for t in (_LMK_GEN, M - _LMK_GEN):
        z_rows_t = _apply_auto_np_free(
            np.asarray(sampling.signed_to_rns_rows(sk.z_ring, (Q,)),
                       dtype=object), t, Q)
        zt_eval = ntt_ops.forward_jit(plan, from_int_array(z_rows_t))
        zt = U64(zt_eval.lo[0], zt_eval.hi[0])
        msg_np = np.zeros((dg, N), dtype=object)
        for d in range(dg):
            msg_np[d, :] = int(powers[d])
        mfac = from_int_array(msg_np)
        ztb = U64(jnp.broadcast_to(zt.lo, (dg, N)),
                  jnp.broadcast_to(zt.hi, (dg, N)))
        msgs_t = mul_mod(mfac, ztb, _scalar_mod(ctx))      # [dg, N]
        kc0, kc1 = _rlwe_encrypt_batch(ctx, z_eval, msgs_t, (dg,), rng)
        ak_lo_list.append(jnp.stack([kc0.lo, kc1.lo], axis=1))  # [dg, 2, N]
        ak_hi_list.append(jnp.stack([kc0.hi, kc1.hi], axis=1))
    ak_lo = jnp.stack(ak_lo_list)                          # [2, dg, 2, N]
    ak_hi = jnp.stack(ak_hi_list)

    ks_a, ks_b = _keyswitch_keygen(ctx, sk, rng)
    return LMKCDEYKey(ek_lo, ek_hi, ak_lo, ak_hi, ks_a, ks_b)


def _lmk_schedule(ctx: BinFHEContext, a_vec: np.ndarray):
    """Host-built fixed schedule for one ciphertext: ops [T] (0 = ext,
    1 = auto g, 2 = auto M-g, 3 = noop), idx [T] (ek row for ext steps).
    Mirrors the reference's EvalAcc control flow with numAutoKeys = 1."""
    p = ctx.params
    N = p.N
    M = 2 * N
    Nh = N // 2
    dlog = _lmk_dlog_table(N)
    neg, pos, cls0, clsM = {}, {}, [], []
    for i, a in enumerate(np.asarray(a_vec, dtype=np.int64) % M):
        w = int((M - a) % M) | 1
        k = dlog[w]
        if k == M:
            clsM.append(i)
        elif k == 0:
            cls0.append(i)
        elif k > 0:
            pos.setdefault(k, []).append(i)
        else:
            neg.setdefault(-k, []).append(i)
    ops, idx = [], []

    def ext(lst):
        for j in lst:
            ops.append(0)
            idx.append(j)

    for i in range(Nh - 1, 0, -1):
        ext(neg.get(i, []))
        ops.append(1)
        idx.append(0)
    ext(clsM)
    ops.append(2)
    idx.append(0)
    for i in range(Nh - 1, 0, -1):
        ext(pos.get(i, []))
        ops.append(1)
        idx.append(0)
    ext(cls0)
    # pad to the static length T = 2*(Nh-1) + 1 + n
    T = 2 * (Nh - 1) + 1 + p.n_lwe
    while len(ops) < T:
        ops.append(3)
        idx.append(0)
    assert len(ops) == T
    return np.asarray(ops, np.int32), np.asarray(idx, np.int32)


@lru_cache(maxsize=None)
def _blind_rotate_lmk_fn(ctx: BinFHEContext):
    """Jitted fixed-schedule LMKCDEY scan (batch = 1 ciphertext: the
    schedule is data-dependent per gate, unlike CGGI/DM)."""
    p = ctx.params
    N, Q, dg, logB = p.N, p.Q, p.dg, p.log_bg
    M = 2 * N
    plan = ctx.plan
    mod = _scalar_mod(ctx)
    signed_decompose = _make_signed_decompose(p)
    half_Q = Q // 2
    B = 1 << logB
    halfB = B // 2

    perms = []
    for t in (_LMK_GEN, M - _LMK_GEN):
        dst, sgn = _auto_perm_sign(N, t)
        # inverse map: out[j] = sign_src[j] * in[src[j]]
        src = np.zeros(N, dtype=np.int32)
        ssn = np.zeros(N, dtype=np.int32)
        for j in range(N):
            src[dst[j]] = j
            ssn[dst[j]] = sgn[j]
        perms.append((jnp.asarray(src), jnp.asarray(ssn)))

    def permute(x: U64, which: int):
        src, ssn = perms[which]
        lo = x.lo[..., src]
        neg = (jnp.uint32(Q) - lo) % jnp.uint32(Q)
        lo = jnp.where(ssn < 0, neg, lo)
        return U64(lo, jnp.zeros_like(lo))

    def digits1(x_lo):
        """Signed base-B digits of one coeff row [N] -> [dg, N] mod Q."""
        signed = jnp.where(x_lo > jnp.uint32(half_Q),
                           x_lo.astype(jnp.int32) - jnp.int32(Q),
                           x_lo.astype(jnp.int32))
        ds = []
        for _ in range(dg):
            r = ((signed + halfB) & (B - 1)) - halfB
            signed = (signed - r) >> logB
            ds.append(r)
        d = jnp.stack(ds)
        lo = jnp.where(d < 0, (d + Q).astype(jnp.uint32), d.astype(jnp.uint32))
        return U64(lo, jnp.zeros_like(lo))

    def ext_step(acc_coeff: U64, j, ek_lo, ek_hi):
        accb = U64(acc_coeff.lo[None], acc_coeff.hi[None])   # [1, 2, N]
        digs = signed_decompose(accb)                        # [1, 2dg, N]
        dct = _ntt_nd(plan, digs)
        key = U64(jnp.take(ek_lo, j, axis=0),
                  jnp.take(ek_hi, j, axis=0))                # [2dg, 2, N]
        dx = U64(dct.lo[0][:, None, :], dct.hi[0][:, None, :])
        prod = mul_mod(dx, key, mod)                         # [2dg, 2, N]
        acc_ext = None
        for r in range(2 * dg):
            term = U64(prod.lo[r], prod.hi[r])
            acc_ext = term if acc_ext is None else \
                add_mod(acc_ext, term, mod.q)
        out = _intt_nd(plan, acc_ext)                        # [2, N]
        return out

    def auto_step(acc_coeff: U64, which: int, ak_lo, ak_hi):
        # permute both rows; keyswitch the c1 row back under z
        pc = permute(acc_coeff, which)                       # [2, N]
        c0p = U64(pc.lo[0], pc.hi[0])
        c1p_lo = pc.lo[1]
        digs = digits1(c1p_lo)                               # [dg, N]
        dct = _ntt_nd(plan, digs)
        key = U64(ak_lo[which], ak_hi[which])                # [dg, 2, N]
        prod = mul_mod(U64(dct.lo[:, None, :], dct.hi[:, None, :]),
                       key, mod)                             # [dg, 2, N]
        acc_ks = None
        for r in range(dg):
            term = U64(prod.lo[r], prod.hi[r])
            acc_ks = term if acc_ks is None else \
                add_mod(acc_ks, term, mod.q)
        ks = _intt_nd(plan, acc_ks)                          # [2, N] coeff
        new_c0 = add_mod(c0p, U64(ks.lo[0], ks.hi[0]), mod.q)
        new_c1 = U64(ks.lo[1], ks.hi[1])
        return U64(jnp.stack([new_c0.lo, new_c1.lo]),
                   jnp.stack([new_c0.hi, new_c1.hi]))

    @jax.jit
    def rotate(acc_init: U64, ops, idx, ek_lo, ek_hi, ak_lo, ak_hi):
        # acc_init [2, N] coeff
        def step(acc, inputs):
            op, j = inputs
            acc = jax.lax.switch(
                op,
                [lambda a: ext_step(a, j, ek_lo, ek_hi),
                 lambda a: auto_step(a, 0, ak_lo, ak_hi),
                 lambda a: auto_step(a, 1, ak_lo, ak_hi),
                 lambda a: a],
                acc)
            return acc, None
        final, _ = jax.lax.scan(step, acc_init, (ops, idx))
        return final

    return rotate


def _bootstrap_core_lmk(ctx: BinFHEContext, bk: LMKCDEYKey,
                        a_2n: np.ndarray, b_2n: np.ndarray,
                        tv: np.ndarray | None = None) -> U64:
    """Blind-rotate via the automorphism orbit; returns acc [B, 2, N]."""
    p = ctx.params
    N, Q = p.N, p.Q
    from ..ops.limb import from_int_array
    if tv is None:
        tv = _test_vector(ctx)
    batch = len(b_2n)
    outs_lo, outs_hi = [], []
    rotate = _blind_rotate_lmk_fn(ctx)
    for bi in range(batch):
        c0 = np.zeros(N, dtype=object)
        shift = int(b_2n[bi]) % (2 * N)
        for j in range(N):
            e = (j + shift) % (2 * N)
            if e < N:
                c0[e] = (c0[e] + tv[j]) % Q
            else:
                c0[e - N] = (c0[e - N] - tv[j]) % Q
        rows = np.zeros((2, N), dtype=object)
        rows[0, :] = c0
        # free initial automorphism by M - g (c1 = 0)
        rows = _apply_auto_np_free(rows, 2 * N - _LMK_GEN, Q)
        acc = from_int_array(rows)
        ops, idx = _lmk_schedule(ctx, np.asarray(a_2n)[bi])
        out = rotate(acc, jnp.asarray(ops), jnp.asarray(idx),
                     bk.ek_lo, bk.ek_hi, bk.ak_lo, bk.ak_hi)
        outs_lo.append(out.lo)
        outs_hi.append(out.hi)
    return U64(jnp.stack(outs_lo), jnp.stack(outs_hi))
