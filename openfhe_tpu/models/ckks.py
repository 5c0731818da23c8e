"""CKKS approximate-arithmetic scheme over RNS towers (TPU-native).

Covers the role of the reference's CKKSrns scheme family
(``pke/lib/scheme/ckksrns/``): context generation with an RNS modulus chain,
ternary-secret keygen, public/secret-key encryption, EvalAdd/Sub/Mult,
relinearization and rotations via hybrid key switching, rescaling
(FIXEDMANUAL scaling technique), and complex packed encode/decode.

Everything device-side is pure-functional array code over RnsPoly pytrees;
the context is a hashable host object closed over by jit. Randomness is
host-side numpy.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import dcrt, encoding, keyswitch
from ..dcrt import Format, RnsBasis, RnsPoly
from ..ops import ntt as ntt_ops
from ..ops import rns
from ..ops.limb import U64, from_int_array, to_int_array
from ..utils import nbtheory, sampling, security


@dataclasses.dataclass(frozen=True)
class CKKSParams:
    """User-facing config (role of CCParams<CryptoContextCKKSRNS>,
    ``pke/include/scheme/cryptocontextparams-base.h``)."""

    ring_dim: int = 1 << 12
    mult_depth: int = 2
    scaling_mod_size: int = 50
    first_mod_size: int = 60
    dnum: int = 3           # hybrid keyswitch digit count
    sigma: float = 3.19
    secret_hw: int = 0      # 0 = dense uniform ternary; else sparse weight
    security_level: str = "HEStd_NotSet"  # HE-standard level, see utils.security
    # Scaling technique (reference: ScalingTechnique, constants.h:59-64).
    # FIXEDMANUAL: the caller rescales. FIXEDAUTO: ops rescale inputs
    # automatically, every level treated as the nominal 2^p scale.
    # FLEXIBLEAUTO: ops track exact per-depth canonical scales
    # (ckks_advanced). FLEXIBLEAUTOEXT: FLEXIBLEAUTO + one extra tower so
    # fresh ciphertexts carry scale 2^p * q_L and the first rescale is free.
    scaling_technique: str = "FIXEDMANUAL"
    # Composite scaling (reference: COMPOSITESCALINGAUTO/MANUAL,
    # constants.h ScalingTechnique + NATIVE_INT=32 builds): each scaling
    # factor 2^scaling_mod_size is realized as `composite_degree` primes of
    # ~scaling_mod_size/d bits each, and one rescale drops d towers. With
    # d=2 and scaling_mod_size <= 60 every tower modulus fits below 2^31,
    # so the whole evaluation path rides the single-limb u32 NTT engine
    # (ops/ntt32.py) — the TPU-native analog of the reference's 32-bit
    # register word target.
    composite_degree: int = 1
    # INDCPA^D noise-flooding decryption (reference: DecryptionNoiseMode
    # NOISE_FLOODING_DECRYPT + ExecutionMode, ``constants.h:93-101``;
    # sigma derivation ``gen-cryptocontext-ckksrns-internal.h:70-92``;
    # flooding added at decrypt ``ckksrns-pke.cpp:49-54``). The protocol is
    # two-phase: run once with execution_mode="NOISE_ESTIMATION", measure
    # the output's log-error with estimate_log_error(), then rebuild the
    # context with execution_mode="EVALUATION" and that noise_estimate —
    # decryption then floods with sigma = 2^(statSec/2 +
    # log2(sqrt(12*numQueries)) + noise_estimate).
    decryption_noise_mode: str = "FIXED_NOISE_DECRYPT"
    execution_mode: str = "EVALUATION"  # or "NOISE_ESTIMATION"
    noise_estimate: float = 0.0         # log2 units, from phase 1
    statistical_security: float = 30.0
    num_adversarial_queries: float = 1.0

    @property
    def flood_decrypt_sigma(self) -> float:
        """Decryption flooding stddev; 0 when flooding is off."""
        if (self.decryption_noise_mode != "NOISE_FLOODING_DECRYPT"
                or self.execution_mode != "EVALUATION"):
            return 0.0
        logstd = (self.statistical_security / 2
                  + np.log2(np.sqrt(12 * self.num_adversarial_queries)))
        return float(2.0 ** (logstd + self.noise_estimate))

    @property
    def num_towers(self) -> int:
        extra = 1 if self.scaling_technique == "FLEXIBLEAUTOEXT" else 0
        return (self.mult_depth + 1 + extra) * self.composite_degree

    @property
    def num_slots(self) -> int:
        return self.ring_dim // 2


@dataclasses.dataclass(frozen=True)
class CKKSContext:
    params: CKKSParams
    q_moduli: Tuple[int, ...]
    p_moduli: Tuple[int, ...]

    @property
    def n(self) -> int:
        return self.params.ring_dim

    @property
    def scale(self) -> float:
        return float(2 ** self.params.scaling_mod_size)

    @property
    def ks_params(self) -> keyswitch.KSParams:
        alpha = -(-len(self.q_moduli) // self.params.dnum)
        return keyswitch.KSParams(self.n, self.q_moduli, self.p_moduli, alpha)

    def basis(self, towers: int | None = None) -> RnsBasis:
        towers = len(self.q_moduli) if towers is None else towers
        return RnsBasis(self.n, self.q_moduli[:towers])

    @property
    def full_qp_basis(self) -> RnsBasis:
        return RnsBasis(self.n, self.q_moduli + self.p_moduli)


def _composite_chain(params: CKKSParams, m: int):
    """Composite modulus chain: level k's scaling factor 2^p is the product
    of `d` NTT primes of ~p/d bits alternating below/above their targets so
    each level's product tracks 2^p (role of CompositeScalingParamsGen;
    every prime stays below 2^31 for the u32 engine)."""
    d = params.composite_degree

    def split_bits(total):
        b = total // d
        parts = [b] * (d - 1) + [total - b * (d - 1)]
        assert all(20 <= p <= 30 for p in parts), (
            f"composite parts {parts} must be 20..30 bits (got "
            f"scaling_mod_size={total}, degree={d})")
        return parts

    used: set = set()
    cursors: dict = {}

    def take_prime(bits: int, below_first: bool) -> int:
        st = cursors.setdefault(bits, [1 << bits, 1 << bits, below_first])
        while True:
            if st[2]:
                st[0] = nbtheory.prev_ntt_prime_below(st[0], m)
                cand = st[0]
            else:
                st[1] = nbtheory.next_ntt_prime_above(st[1], m)
                cand = st[1]
            st[2] = not st[2]
            if cand not in used:
                used.add(cand)
                return cand

    qs = []
    extra = 1 if params.scaling_technique == "FLEXIBLEAUTOEXT" else 0
    for level in range(params.mult_depth + 1 + extra):
        bits = params.first_mod_size if level == 0 else params.scaling_mod_size
        for i, part in enumerate(split_bits(bits)):
            qs.append(take_prime(part, below_first=(i % 2 == 0)))
    return qs, used


def gen_context(params: CKKSParams) -> CKKSContext:
    """Build the modulus chain (role of ParamsGenCKKSRNS +
    rns-cryptoparameters precomputation, ``pke/lib/schemerns/``).

    Scaling primes alternate just below/above 2^scaling_mod_size so the
    running product stays close to the nominal scale (FIXEDMANUAL).
    """
    n = params.ring_dim
    m = 2 * n
    L = params.num_towers
    d = params.composite_degree
    if params.decryption_noise_mode == "NOISE_FLOODING_DECRYPT" and \
            params.execution_mode == "EVALUATION":
        # reference: gen-cryptocontext-ckksrns-internal.h:72-92
        if params.noise_estimate == 0:
            raise ValueError(
                "noise_estimate must be set (run execution_mode="
                "'NOISE_ESTIMATION' first) for NOISE_FLOODING_DECRYPT "
                "EVALUATION contexts")
        logstd = (params.statistical_security / 2
                  + np.log2(np.sqrt(12 * params.num_adversarial_queries)))
        if logstd + params.noise_estimate > params.scaling_mod_size - 3:
            raise ValueError(
                f"precision of less than 3 bits is not supported: logstd "
                f"{logstd:.1f} + noise_estimate {params.noise_estimate:.1f} "
                f"must be <= scaling_mod_size - 3 = "
                f"{params.scaling_mod_size - 3}")
    if d > 1:
        assert params.scaling_technique in ("FIXEDMANUAL", "FIXEDAUTO"), \
            "composite scaling supports FIXEDMANUAL/FIXEDAUTO (as the " \
            "reference's COMPOSITESCALING modes)"
        qs, used = _composite_chain(params, m)
        sp_bits = 30
    else:
        q0 = nbtheory.first_prime(params.first_mod_size, m)
        used = {q0}
        qs = [q0]
        base = 1 << params.scaling_mod_size
        lo_cursor = base
        hi_cursor = base
        below = True
        while len(qs) < L:
            if below:
                lo_cursor = nbtheory.prev_ntt_prime_below(lo_cursor, m)
                while lo_cursor in used:
                    lo_cursor = nbtheory.prev_ntt_prime_below(lo_cursor, m)
                qs.append(lo_cursor)
                used.add(lo_cursor)
            else:
                hi_cursor = nbtheory.next_ntt_prime_above(hi_cursor, m)
                while hi_cursor in used:
                    hi_cursor = nbtheory.next_ntt_prime_above(hi_cursor, m)
                qs.append(hi_cursor)
                used.add(hi_cursor)
            below = not below
        sp_bits = 60
    # special primes: sized to the largest tower word (60-bit classic,
    # 30-bit composite so they stay on the u32 path), scanned downward
    alpha = -(-L // params.dnum)
    ps = []
    cursor = nbtheory.first_prime(sp_bits, m)
    while len(ps) < alpha:
        while cursor in used:
            cursor = nbtheory.previous_prime(cursor, m)
        ps.append(cursor)
        used.add(cursor)
        cursor = nbtheory.previous_prime(cursor, m)
    log_qp = sum(q.bit_length() for q in qs) + sum(p.bit_length() for p in ps)
    security.validate(n, log_qp, params.security_level)
    return CKKSContext(params, tuple(qs), tuple(ps))


# ---------------------------------------------------------------------------
# Keys
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SecretKey:
    coeffs: np.ndarray  # ternary, int64, host
    _cache: dict = dataclasses.field(default_factory=dict)

    def poly(self, basis: RnsBasis) -> RnsPoly:
        """EVAL-form secret over the given basis (cached)."""
        if basis not in self._cache:
            rows = sampling.signed_to_rns_rows(self.coeffs, basis.moduli)
            p = dcrt.from_int_rows(basis, rows, Format.COEFF)
            self._cache[basis] = dcrt.to_eval(p)
        return self._cache[basis]


@dataclasses.dataclass
class PublicKey:
    b: RnsPoly  # -a*s + e  (EVAL, full Q)
    a: RnsPoly


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Ciphertext:
    """CKKS ciphertext: tuple of EVAL-form polys over a Q-prefix basis.

    scale and the poly count are static metadata (jit specializes on them).
    """

    polys: Tuple[RnsPoly, ...]
    scale: float = dataclasses.field(metadata=dict(static=True))

    @property
    def basis(self) -> RnsBasis:
        return self.polys[0].basis

    @property
    def towers(self) -> int:
        return self.basis.L


def keygen(ctx: CKKSContext, rng: np.random.Generator
           ) -> Tuple[PublicKey, SecretKey]:
    """(role of KeyGenInternal, ``pke/lib/schemebase/base-pke.cpp:43``)."""
    n = ctx.n
    hw = ctx.params.secret_hw
    coeffs = sampling.sparse_ternary_coeffs(n, hw, rng) if hw else \
        sampling.ternary_coeffs(n, rng)
    sk = SecretKey(coeffs)
    basis = ctx.basis()
    s = sk.poly(basis)
    a = dcrt.from_int_rows(
        basis, sampling.uniform_rns_rows(n, basis.moduli, rng), Format.EVAL)
    e = _sample_error_poly(ctx, basis, rng)
    b = dcrt.sub(e, dcrt.mul(a, s))
    return PublicKey(b, a), sk


def _sample_error_poly(ctx: CKKSContext, basis: RnsBasis,
                       rng: np.random.Generator) -> RnsPoly:
    rows = sampling.signed_to_rns_rows(
        sampling.gaussian_coeffs(ctx.n, rng, ctx.params.sigma), basis.moduli)
    return dcrt.to_eval(dcrt.from_int_rows(basis, rows, Format.COEFF))


def relin_keygen(ctx: CKKSContext, sk: SecretKey,
                 rng: np.random.Generator) -> keyswitch.KSKey:
    """Key for s^2 -> s (relinearization)."""
    qp = ctx.full_qp_basis
    s = sk.poly(qp)
    s2 = dcrt.mul(s, s)
    return keyswitch.keygen(ctx.ks_params, s, s2, rng, ctx.params.sigma)


def rotation_indices_to_galois(n: int, rot: int) -> int:
    """Slot rotation by `rot` -> Galois element 5^rot mod 2n."""
    return pow(5, rot % (n // 2), 2 * n)


def rot_keygen(ctx: CKKSContext, sk: SecretKey, rotations: Sequence[int],
               rng: np.random.Generator) -> Dict[int, keyswitch.KSKey]:
    """Keys for sigma_k(s) -> s for each requested slot rotation. The
    whole set is generated in ONE batched device dispatch
    (keyswitch.keygen_batch) — at bootstrap scale the per-key dispatch
    loop dominated keygen wall time through the remote tunnel."""
    qp = ctx.full_qp_basis
    s = sk.poly(qp)
    rotations = list(rotations)
    if not rotations:
        return {}
    s_rots = [dcrt.automorphism(s, rotation_indices_to_galois(ctx.n, r))
              for r in rotations]
    keys = keyswitch.keygen_batch(ctx.ks_params, s, s_rots, rng,
                                  ctx.params.sigma)
    return dict(zip(rotations, keys))


def conj_keygen(ctx: CKKSContext, sk: SecretKey,
                rng: np.random.Generator) -> keyswitch.KSKey:
    qp = ctx.full_qp_basis
    s = sk.poly(qp)
    s_conj = dcrt.automorphism(s, 2 * ctx.n - 1)
    return keyswitch.keygen(ctx.ks_params, s, s_conj, rng, ctx.params.sigma)


# ---------------------------------------------------------------------------
# Encrypt / decrypt
# ---------------------------------------------------------------------------


def encode(ctx: CKKSContext, values: Sequence[complex],
           towers: int | None = None, scale: float | None = None) -> RnsPoly:
    """Complex slots -> EVAL-form plaintext poly."""
    scale = scale or ctx.scale
    basis = ctx.basis(towers)
    coeffs = encoding.ckks_encode(values, ctx.n, scale)
    rows = sampling.signed_to_rns_rows(coeffs, basis.moduli)
    return dcrt.to_eval(dcrt.from_int_rows(basis, rows, Format.COEFF))


def encrypt(ctx: CKKSContext, pk: PublicKey, values: Sequence[complex],
            rng: np.random.Generator) -> Ciphertext:
    """(role of PKEBase::Encrypt / EncryptZeroCore,
    ``pke/lib/schemebase/base-pke.cpp:97-186``).

    Under FLEXIBLEAUTOEXT the fresh ciphertext carries scale 2^(2p) on the
    extra tower (encode at 2^p, then an EXACT integer multiply by 2^p —
    float64 encoding at 2^(2p) would lose the low bits); the first auto op
    rescales it onto the canonical chain (ckks_advanced.canonicalize)."""
    basis = ctx.basis()
    m = encode(ctx, values)
    scale = ctx.scale
    if ctx.params.scaling_technique == "FLEXIBLEAUTOEXT":
        m = dcrt.mul_scalar_int(m, 1 << ctx.params.scaling_mod_size)
        scale = ctx.scale * ctx.scale
    v_rows = sampling.signed_to_rns_rows(
        sampling.ternary_coeffs(ctx.n, rng), basis.moduli)
    v = dcrt.to_eval(dcrt.from_int_rows(basis, v_rows, Format.COEFF))
    e0 = _sample_error_poly(ctx, basis, rng)
    e1 = _sample_error_poly(ctx, basis, rng)
    c0 = dcrt.add(dcrt.add(dcrt.mul(pk.b, v), e0), m)
    c1 = dcrt.add(dcrt.mul(pk.a, v), e1)
    return Ciphertext((c0, c1), scale)


def decrypt_poly(ctx: CKKSContext, sk: SecretKey, ct: Ciphertext) -> RnsPoly:
    """m' = sum_i c_i s^i over the ct basis (EVAL)."""
    basis = ct.basis
    s = sk.poly(basis)
    acc = ct.polys[0]
    s_pow = s
    for c in ct.polys[1:]:
        acc = dcrt.add(acc, dcrt.mul(c, s_pow))
        s_pow = dcrt.mul(s_pow, s)
    return acc


def decrypt(ctx: CKKSContext, sk: SecretKey, ct: Ciphertext,
            num_slots: int | None = None,
            rng: np.random.Generator | None = None) -> np.ndarray:
    """Decrypt + decode to complex slots (host CRT interpolation).

    In NOISE_FLOODING_DECRYPT EVALUATION mode the phase is flooded with
    Gaussian noise of ctx.params.flood_decrypt_sigma before decoding
    (reference: ``ckksrns-pke.cpp:49-54``)."""
    m_eval = decrypt_poly(ctx, sk, ct)
    flood_sigma = ctx.params.flood_decrypt_sigma
    if flood_sigma:
        rng = np.random.default_rng() if rng is None else rng
        mags = np.rint(rng.normal(0, flood_sigma, size=ctx.n)).astype(object)
        rows = sampling.signed_to_rns_rows(mags, ct.basis.moduli)
        noise = dcrt.to_eval(dcrt.from_int_rows(ct.basis, rows, Format.COEFF))
        m_eval = dcrt.add(m_eval, noise)
    m_coeff = dcrt.to_coeff(m_eval)
    rows = dcrt.to_int_rows(m_coeff)
    coeffs = crt_interpolate_centered(rows, ct.basis.moduli)
    return encoding.ckks_decode(coeffs, ctx.n, ct.scale, num_slots)


def estimate_log_error(slots, scale: float) -> float:
    """log2 error estimate of a decrypted NOISE_ESTIMATION-phase result
    over REAL inputs: the imaginary parts of the decoded slots are pure
    noise (z - conj(z) = 2i Im z), and their stddev times the ciphertext
    scale measures the computation's error in PHASE units — the reference
    estimates at scale Delta without the final 2^-p division
    (CKKSPackedEncoding::Decode EXEC_NOISE_ESTIMATION branch,
    ``ckkspackedencoding.cpp:460-515``; surfaced as
    Plaintext::GetLogError). Feed the result into CKKSParams.noise_estimate
    for the EVALUATION-phase context; pass the decrypted ciphertext's
    ``.scale`` as ``scale``."""
    slots = np.asarray(slots)
    stddev = float(np.std(np.imag(slots))) * float(scale)
    stddev = max(stddev, 2.0 ** -40)
    return float(np.round(np.log2(stddev)))


def crt_interpolate_centered(rows, moduli: Tuple[int, ...]):
    """Host: RNS rows -> centered big-int coefficients (exact).

    (role of DCRTPolyImpl::CRTInterpolate, ``dcrtpoly-impl.h:851``)
    """
    Q = 1
    for q in moduli:
        Q *= q
    lifts = []
    for q in moduli:
        qh = Q // q
        lifts.append(qh * pow(qh % q, -1, q))
    n = len(rows[0])
    out = []
    for k in range(n):
        x = 0
        for i, q in enumerate(moduli):
            x += int(rows[i][k]) * lifts[i]
        x %= Q
        if x > Q // 2:
            x -= Q
        out.append(x)
    return out


# ---------------------------------------------------------------------------
# Homomorphic ops
# ---------------------------------------------------------------------------


def _align(ct1: Ciphertext, ct2: Ciphertext):
    assert ct1.basis == ct2.basis, "level mismatch (rescale/level-reduce first)"
    assert abs(ct1.scale - ct2.scale) / ct1.scale < 1e-9, "scale mismatch"
    return ct1, ct2


def eval_add(ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
    _align(ct1, ct2)
    k = max(len(ct1.polys), len(ct2.polys))
    polys = []
    for i in range(k):
        if i < len(ct1.polys) and i < len(ct2.polys):
            polys.append(dcrt.add(ct1.polys[i], ct2.polys[i]))
        elif i < len(ct1.polys):
            polys.append(ct1.polys[i])
        else:
            polys.append(ct2.polys[i])
    return Ciphertext(tuple(polys), ct1.scale)


def eval_sub(ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
    _align(ct1, ct2)
    k = max(len(ct1.polys), len(ct2.polys))
    polys = []
    for i in range(k):
        if i < len(ct1.polys) and i < len(ct2.polys):
            polys.append(dcrt.sub(ct1.polys[i], ct2.polys[i]))
        elif i < len(ct1.polys):
            polys.append(ct1.polys[i])
        else:
            polys.append(dcrt.neg(ct2.polys[i]))
    return Ciphertext(tuple(polys), ct1.scale)


def eval_mult(ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
    """Tensor product without relinearization (degree grows).

    (role of LeveledSHEBase::EvalMultCore,
    ``pke/lib/schemebase/base-leveledshe.cpp:657-696``)
    """
    _align(ct1, ct2)
    d1, d2 = len(ct1.polys), len(ct2.polys)
    out = [None] * (d1 + d2 - 1)
    for i in range(d1):
        for j in range(d2):
            p = dcrt.mul(ct1.polys[i], ct2.polys[j])
            out[i + j] = p if out[i + j] is None else dcrt.add(out[i + j], p)
    return Ciphertext(tuple(out), ct1.scale * ct2.scale)


def relinearize(ct: Ciphertext, evk: keyswitch.KSKey) -> Ciphertext:
    """Reduce a degree-2 ciphertext back to 2 components."""
    assert len(ct.polys) == 3
    d0, d1 = keyswitch.apply(evk, ct.polys[2])
    return Ciphertext((dcrt.add(ct.polys[0], d0),
                       dcrt.add(ct.polys[1], d1)), ct.scale)


def eval_mult_relin(ct1: Ciphertext, ct2: Ciphertext,
                    evk: keyswitch.KSKey) -> Ciphertext:
    return relinearize(eval_mult(ct1, ct2), evk)


def eval_square_relin(ct: Ciphertext, evk: keyswitch.KSKey) -> Ciphertext:
    return relinearize(eval_mult(ct, ct), evk)


def rescale(ct: Ciphertext, degree: int = 1) -> Ciphertext:
    """Drop the last `degree` towers, dividing by each dropped modulus
    (FIXEDMANUAL ModReduce; reference:
    LeveledSHECKKSRNS::ModReduceInternalInPlace ->
    DropLastElementAndScale). Composite-scaling contexts pass
    degree=ctx.params.composite_degree (one logical rescale = d tower
    drops, reference COMPOSITESCALING semantics); ``rescale_ctx`` wraps
    that."""
    for _ in range(degree):
        assert ct.towers >= 2, \
            "rescale needs at least 2 towers (increase mult_depth)"
        moduli = ct.basis.moduli
        new_basis = ct.basis.drop_last()
        fn = _rescale_fn(moduli)
        polys = [dcrt.make_poly(new_basis, fn(p.data), Format.EVAL)
                 for p in ct.polys]
        ct = Ciphertext(tuple(polys), ct.scale / moduli[-1])
    return ct


def rescale_ctx(ctx: CKKSContext, ct: Ciphertext) -> Ciphertext:
    """One logical rescale under the context's composite degree."""
    return rescale(ct, ctx.params.composite_degree)


def level_reduce(ct: Ciphertext, levels: int = 1) -> Ciphertext:
    """Drop towers without scaling (reference: LevelReduce)."""
    if levels == 0:
        return ct
    new_basis = ct.basis.drop_last(levels)
    L = new_basis.L
    polys = [dcrt.make_poly(new_basis, U64(p.lo[:L], p.hi[:L]), Format.EVAL)
             for p in ct.polys]
    return Ciphertext(tuple(polys), ct.scale)


def compress(ctx: CKKSContext, ct: Ciphertext, towers_left: int | None = None
             ) -> Ciphertext:
    """Shrink the ciphertext modulus before transmission/decryption
    (role of CryptoContext::Compress -> LeveledSHERNS::Compress,
    rns-leveledshe.cpp:358-372): rescale any pending noise degree away,
    then drop towers. Under composite scaling the floor is d towers —
    the first "level" q0 is itself d primes."""
    if towers_left is None:
        towers_left = ctx.params.composite_degree
    while ct.scale > 1.5 * ctx.scale and ct.towers > towers_left:
        ct = rescale(ct)
    if ct.towers > towers_left:
        ct = level_reduce(ct, ct.towers - towers_left)
    return ct


def eval_rotate(ct: Ciphertext, rot: int, rot_key: keyswitch.KSKey
                ) -> Ciphertext:
    """Rotate slots by `rot` (reference: EvalAtIndex / EvalAutomorphism).

    Decomposes FIRST and applies the automorphism to the hoisted digit
    stack (the reference's EvalFastRotation order) rather than rotating
    c1 before the keyswitch: beyond sharing the hoisting noise argument,
    on TPU the rotate-then-decompose order lets XLA fuse the slot gather
    into the NTT stage pipeline, which it handles pathologically
    (~10x: measured in tpu_diag_rotate2.py, round 5)."""
    assert len(ct.polys) == 2
    n = ct.basis.n
    k = rotation_indices_to_galois(n, rot)
    digits = keyswitch.hoist_decompose(rot_key.params, ct.polys[1])
    c0 = dcrt.automorphism(ct.polys[0], k)
    d0, d1 = keyswitch.hoist_rotate_apply(rot_key, digits, ct.basis, k)
    return Ciphertext((dcrt.add(c0, d0), d1), ct.scale)


def fast_rotation_precompute(ct: Ciphertext, any_key: keyswitch.KSKey):
    """Hoisted digit decomposition of c1, shared by every subsequent
    eval_fast_rotate of the same ciphertext (reference:
    EvalFastRotationPrecompute, keyswitch-hybrid.cpp:330).  Returns the
    EVAL-form digit stack over Q_l*P.  ``any_key`` supplies the keyswitch
    geometry (all of a context's keys share it)."""
    assert len(ct.polys) == 2
    return keyswitch.hoist_decompose(any_key.params, ct.polys[1])


def eval_fast_rotate(ct: Ciphertext, rot: int, rot_key: keyswitch.KSKey,
                     digits) -> Ciphertext:
    """Rotation using a hoisted decomposition (reference: EvalFastRotation,
    keyswitch-hybrid.cpp / base-leveledshe).  The automorphism is applied
    to the PRE-DECOMPOSED digits — a slot gather on the stack — which is
    valid because the decomposition is coefficient-wise linear; the basis-
    conversion overflow term changes by a tolerated multiple of Q (the
    same argument as the reference's hoisting)."""
    assert len(ct.polys) == 2
    n = ct.basis.n
    k = rotation_indices_to_galois(n, rot)
    c0 = dcrt.automorphism(ct.polys[0], k)
    d0, d1 = keyswitch.hoist_rotate_apply(rot_key, digits, ct.basis, k)
    return Ciphertext((dcrt.add(c0, d0), d1), ct.scale)


def eval_fast_conjugate(ct: Ciphertext, conj_key: keyswitch.KSKey,
                        digits) -> Ciphertext:
    """Conjugation via a hoisted decomposition (galois element 2n-1)."""
    assert len(ct.polys) == 2
    n = ct.basis.n
    k = 2 * n - 1
    c0 = dcrt.automorphism(ct.polys[0], k)
    d0, d1 = keyswitch.hoist_rotate_apply(conj_key, digits, ct.basis, k)
    return Ciphertext((dcrt.add(c0, d0), d1), ct.scale)


def eval_conjugate(ct: Ciphertext, conj_key: keyswitch.KSKey) -> Ciphertext:
    """Hoisted order for the same reason as eval_rotate."""
    assert len(ct.polys) == 2
    n = ct.basis.n
    k = 2 * n - 1
    digits = keyswitch.hoist_decompose(conj_key.params, ct.polys[1])
    c0 = dcrt.automorphism(ct.polys[0], k)
    d0, d1 = keyswitch.hoist_rotate_apply(conj_key, digits, ct.basis, k)
    return Ciphertext((dcrt.add(c0, d0), d1), ct.scale)


def eval_add_plain(ctx: CKKSContext, ct: Ciphertext,
                   values: Sequence[complex]) -> Ciphertext:
    pt = encode(ctx, values, towers=ct.towers, scale=ct.scale)
    return Ciphertext((dcrt.add(ct.polys[0], pt),) + ct.polys[1:], ct.scale)


def eval_mult_plain(ctx: CKKSContext, ct: Ciphertext,
                    values: Sequence[complex]) -> Ciphertext:
    pt = encode(ctx, values, towers=ct.towers)
    return Ciphertext(tuple(dcrt.mul(p, pt) for p in ct.polys),
                      ct.scale * ctx.scale)


# NOTE ON JIT GRANULARITY: Ciphertext.scale is static pytree metadata, so
# jitting these wrappers would retrace every op graph for every distinct
# scale float (a compile explosion in deep Chebyshev/bootstrap chains).
# All device work is instead jitted at the RnsPoly level (dcrt ops,
# keyswitch.apply, the cached rescale kernel below), which is scale-free;
# callers wanting one fused graph (benchmarks) wrap a whole pipeline in an
# outer jax.jit themselves.


@lru_cache(maxsize=None)
def _rescale_fn(moduli: Tuple[int, ...]):
    return jax.jit(lambda d: rns.rescale_eval(d, moduli))
