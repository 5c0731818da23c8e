"""Double-CRT (RNS) polynomials as limb-planar device arrays.

The reference's central type ``DCRTPolyImpl`` (a std::vector of single-tower
polynomials looped under OpenMP, ``lattice/hal/default/dcrtpoly-impl.h``) is
re-designed here as pure data: a polynomial over basis {q_0..q_{L-1}} at ring
dimension n is one U64 whose lo/hi arrays have shape [L, n]. Tower loops
become array axes; every elementwise op is a single broadcasted VPU program;
the format flag (COEFF/EVAL) is static pytree metadata so jit specializes on
it. There is no object graph and no offload manager: schemes are pure
functions over these pytrees.
"""

from __future__ import annotations

import dataclasses
from enum import Enum
from functools import lru_cache
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops import automorph, modular, ntt
from .ops.limb import U64, from_int_array, pack, to_int_array, unpack
from .ops.modular import ModConsts


class Format(str, Enum):
    COEFF = "coeff"
    EVAL = "eval"


@dataclasses.dataclass(frozen=True)
class RnsBasis:
    """Hashable host-side descriptor of an RNS basis (static under jit)."""

    n: int
    moduli: Tuple[int, ...]

    def __post_init__(self):
        object.__setattr__(self, "moduli", tuple(int(q) for q in self.moduli))

    @property
    def L(self) -> int:
        return len(self.moduli)

    @property
    def big_modulus(self) -> int:
        prod = 1
        for q in self.moduli:
            prod *= q
        return prod

    # --- cached derived tables (host/device constants) ---

    @property
    def mod(self) -> ModConsts:
        return _basis_mod(self)

    @property
    def is_u32(self) -> bool:
        """Every modulus < 2^31: elementwise ops and NTTs run single-limb
        u32 arithmetic on the lo planes (hi planes are identically zero
        under the reduced-residue contract)."""
        return modular.is_u32_moduli(self.moduli)

    @property
    def mod32(self):
        return _basis_mod32(self)

    @property
    def plan(self) -> ntt.NTTPlan:
        return _basis_plan(self)

    def drop_last(self, k: int = 1) -> "RnsBasis":
        return RnsBasis(self.n, self.moduli[:-k])

    def subset(self, idx) -> "RnsBasis":
        return RnsBasis(self.n, tuple(self.moduli[i] for i in idx))

    def concat(self, other: "RnsBasis") -> "RnsBasis":
        assert self.n == other.n
        return RnsBasis(self.n, self.moduli + other.moduli)


@lru_cache(maxsize=None)
def _basis_mod(basis: RnsBasis) -> ModConsts:
    return modular.make_mod_consts(basis.moduli, trailing_dims=1)


@lru_cache(maxsize=None)
def _basis_mod32(basis: RnsBasis):
    return modular.make_mod_consts32(basis.moduli, trailing_dims=1)


def _u32_out(lo) -> U64:
    return U64(lo, jnp.zeros_like(lo))


@lru_cache(maxsize=None)
def _basis_plan(basis: RnsBasis) -> ntt.NTTPlan:
    return ntt.make_plan(basis.n, basis.moduli)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RnsPoly:
    """A polynomial in R_Q = Z_Q[x]/(x^n+1), Q = prod moduli, RNS form.

    data: U64 of arrays [L, n]. fmt/basis are static metadata.
    """

    lo: jax.Array
    hi: jax.Array
    basis: RnsBasis = dataclasses.field(metadata=dict(static=True))
    fmt: Format = dataclasses.field(metadata=dict(static=True))

    @property
    def data(self) -> U64:
        return U64(self.lo, self.hi)

    def with_data(self, data: U64, fmt: Format | None = None,
                  basis: RnsBasis | None = None) -> "RnsPoly":
        return RnsPoly(data.lo, data.hi, basis or self.basis, fmt or self.fmt)


def make_poly(basis: RnsBasis, data: U64, fmt: Format) -> RnsPoly:
    return RnsPoly(data.lo, data.hi, basis, fmt)


def zero_poly(basis: RnsBasis, fmt: Format = Format.EVAL) -> RnsPoly:
    z = jnp.zeros((basis.L, basis.n), jnp.uint32)
    return RnsPoly(z, z, basis, fmt)


def from_int_rows(basis: RnsBasis, rows, fmt: Format) -> RnsPoly:
    return make_poly(basis, from_int_array(rows), fmt)


def to_int_rows(p: RnsPoly) -> np.ndarray:
    return to_int_array(p.data)


# ---------------------------------------------------------------------------
# Elementwise algebra (valid in either format; both operands must match)
# ---------------------------------------------------------------------------


def _check(a: RnsPoly, b: RnsPoly):
    assert a.basis == b.basis, "RNS basis mismatch"
    assert a.fmt == b.fmt, "format mismatch"


def add(a: RnsPoly, b: RnsPoly) -> RnsPoly:
    _check(a, b)
    if a.basis.is_u32:
        return a.with_data(_u32_out(
            modular.add_mod32(a.lo, b.lo, a.basis.mod32.q)))
    return a.with_data(modular.add_mod(a.data, b.data, a.basis.mod.q))


def sub(a: RnsPoly, b: RnsPoly) -> RnsPoly:
    _check(a, b)
    if a.basis.is_u32:
        return a.with_data(_u32_out(
            modular.sub_mod32(a.lo, b.lo, a.basis.mod32.q)))
    return a.with_data(modular.sub_mod(a.data, b.data, a.basis.mod.q))


def neg(a: RnsPoly) -> RnsPoly:
    if a.basis.is_u32:
        return a.with_data(_u32_out(
            modular.neg_mod32(a.lo, a.basis.mod32.q)))
    return a.with_data(modular.neg_mod(a.data, a.basis.mod.q))


def mul(a: RnsPoly, b: RnsPoly) -> RnsPoly:
    """Elementwise product; meaningful ring product only in EVAL format."""
    _check(a, b)
    if a.basis.is_u32:
        return a.with_data(_u32_out(
            modular.mul_mod32(a.lo, b.lo, a.basis.mod32)))
    return a.with_data(modular.mul_mod(a.data, b.data, a.basis.mod))


def mul_scalar_int(a: RnsPoly, c: int) -> RnsPoly:
    """Multiply by a plain integer constant (reduced per tower, Shoup)."""
    consts = [c % q for q in a.basis.moduli]
    cc = _tower_const(a.basis, tuple(consts))
    if a.basis.is_u32:
        return a.with_data(_u32_out(modular.mul_mod_shoup32(
            a.lo, cc[0].lo, cc[1].hi, a.basis.mod32.q)))
    return a.with_data(
        modular.mul_mod_shoup(a.data, cc[0], cc[1], a.basis.mod.q))


@lru_cache(maxsize=None)
def _tower_const(basis: RnsBasis, consts: tuple):
    vals = from_int_array([[c] for c in consts])
    pres = from_int_array(
        [[modular.shoup_precon_int(c, q)] for c, q in zip(consts, basis.moduli)])
    return vals, pres


def tower_const(basis: RnsBasis, consts) -> tuple:
    """[L,1]-shaped U64 constant + Shoup precon for per-tower constants."""
    return _tower_const(basis, tuple(int(c) for c in consts))


def _mul_tower_const(a: RnsPoly, consts: tuple) -> RnsPoly:
    cc, pre = tower_const(a.basis, consts)
    if a.basis.is_u32:
        return a.with_data(_u32_out(modular.mul_mod_shoup32(
            a.lo, cc.lo, pre.hi, a.basis.mod32.q)))
    return a.with_data(modular.mul_mod_shoup(a.data, cc, pre, a.basis.mod.q))


_mul_tower_const_jit = jax.jit(_mul_tower_const, static_argnums=1)


def mul_tower_const(a: RnsPoly, consts) -> RnsPoly:
    return _mul_tower_const_jit(a, tuple(int(c) for c in consts))


# ---------------------------------------------------------------------------
# Format switching (the per-tower NTT of the reference's SwitchFormat,
# dcrtpoly-impl.h:2518) and automorphisms
# ---------------------------------------------------------------------------


def to_eval(a: RnsPoly) -> RnsPoly:
    if a.fmt == Format.EVAL:
        return a
    fn = _fmt_jit(a.basis, True, _DNTT_CFG["mesh"], _DNTT_CFG["min_n"])
    return a.with_data(fn(a.data), fmt=Format.EVAL)


def to_coeff(a: RnsPoly) -> RnsPoly:
    if a.fmt == Format.COEFF:
        return a
    fn = _fmt_jit(a.basis, False, _DNTT_CFG["mesh"], _DNTT_CFG["min_n"])
    return a.with_data(fn(a.data), fmt=Format.COEFF)


# --- distributed-NTT routing -------------------------------------------------
#
# Opt-in: set_distributed_ntt(mesh) makes every to_eval/to_coeff at ring
# dimension >= min_n run the four-step coefficient-sharded NTT (one ICI
# all-to-all at the transpose) instead of the stage-pipelined single-shard
# transform. Both paths are bit-exact and share the same slot-order contract
# (parallel/dntt.py), so schemes need no changes. The config is read at
# trace time; changing it invalidates the dispatch cache key.

_DNTT_CFG = {"mesh": None, "min_n": 4096}


def set_distributed_ntt(mesh, min_n: int = 4096) -> None:
    """Route SwitchFormat NTTs over a ("tower", "coeff") mesh (None resets).

    The TPU answer to the butterfly-stage data dependence the reference
    handles only on-host (transformnat-impl.h:197-238; SURVEY §2.7
    "host is the interconnect").

    Clears jit caches: the config is read at trace time (also inside the
    jitted keyswitch entry points via ntt_forward_data), so traces built
    under the previous config must not be reused.
    """
    changed = (_DNTT_CFG["mesh"] is not mesh or _DNTT_CFG["min_n"] != min_n)
    _DNTT_CFG["mesh"] = mesh
    _DNTT_CFG["min_n"] = min_n
    if changed:
        jax.clear_caches()


def ntt_forward_data(basis: RnsBasis, data: U64) -> U64:
    """Raw-limb forward NTT over `basis` honoring the distributed-NTT
    config (trace-time dispatch; safe to call inside jit). Supports
    arbitrary leading batch dims with towers on axis -2."""
    mesh = _DNTT_CFG["mesh"]
    if mesh is not None and basis.n >= _DNTT_CFG["min_n"]:
        from .parallel import dntt

        n1, n2 = dntt.split_factors(basis.n)
        return dntt.four_step_forward(data, n1, n2, basis.moduli, mesh=mesh)
    return ntt.forward(basis.plan, data)


def ntt_inverse_data(basis: RnsBasis, data: U64) -> U64:
    """Raw-limb inverse NTT over `basis` (see ntt_forward_data)."""
    mesh = _DNTT_CFG["mesh"]
    if mesh is not None and basis.n >= _DNTT_CFG["min_n"]:
        from .parallel import dntt

        n1, n2 = dntt.split_factors(basis.n)
        return dntt.four_step_inverse(data, n1, n2, basis.moduli, mesh=mesh)
    return ntt.inverse(basis.plan, data)


@lru_cache(maxsize=None)
def _fmt_jit(basis: RnsBasis, forward: bool, mesh, min_n: int):
    """Jitted SwitchFormat transform, keyed on basis AND the distributed
    config so flipping set_distributed_ntt never reuses a stale trace."""
    if mesh is not None and basis.n >= min_n:
        from .parallel import dntt

        n1, n2 = dntt.split_factors(basis.n)
        step = dntt.four_step_forward if forward else dntt.four_step_inverse
        return jax.jit(
            lambda d: step(d, n1, n2, basis.moduli, mesh=mesh))
    plan = basis.plan
    op = ntt.forward if forward else ntt.inverse
    return jax.jit(lambda d: op(plan, d))


def automorphism(a: RnsPoly, k: int) -> RnsPoly:
    if a.fmt == Format.EVAL:
        if a.basis.is_u32:
            return a.with_data(_u32_out(
                automorph.apply_eval_array(a.lo, a.basis.n, k)))
        return a.with_data(automorph.apply_eval(a.data, a.basis.n, k))
    return a.with_data(
        automorph.apply_coeff(a.data, a.basis.mod.q, a.basis.n, k))


# ---------------------------------------------------------------------------
# Jit all op-level entry points. RnsPoly's static metadata (basis, fmt)
# drives retracing; eager dispatch would recompile per tiny op instead.
# ---------------------------------------------------------------------------

add = jax.jit(add)
sub = jax.jit(sub)
neg = jax.jit(neg)
mul = jax.jit(mul)
mul_scalar_int = jax.jit(mul_scalar_int, static_argnums=1)
# to_eval/to_coeff dispatch to per-(basis, distributed-config) jitted
# transforms via _fmt_jit — not re-jitted here.
automorphism = jax.jit(automorphism, static_argnums=1)
