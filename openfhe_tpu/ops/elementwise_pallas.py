"""Pallas TPU kernels for fused element-wise modular arithmetic.

The limb/modular functions are pure jax.numpy, so they run unchanged inside
Pallas kernel bodies; what Pallas adds is explicit VMEM blocking and fusion
of whole op chains (multiply-accumulate) into one pass over HBM — the role
the reference's DPU element-wise kernels played near memory
(``src/core/pim/dpu/element-wise/*.c``), done on-chip instead.

`fused_mac_mod`: acc' = (acc + x*y) mod q over [R, n] residue stacks — the
inner op of the keyswitch digit inner product — in one kernel launch
instead of a mul_mod + add_mod pair.

Measured on TPU v5e at [8, 65536]: XLA's automatic fusion of the jnp chain
(780 us) currently beats this hand-blocked kernel (1345 us), so the jnp
path stays the default; the kernel remains as the validated on-ramp for
deeper fusion (NTT stages, keyswitch pipelines) where XLA cannot fuse
across reshapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limb import U64
from .modular import ModConsts, add_mod, mul_mod

LANE = 128
SUBLANE = 8
BLOCK_N = 2048  # lanes per block (multiple of 128)


def _mac_kernel(xlo, xhi, ylo, yhi, alo, ahi,
                qlo, qhi, mulo, muhi, r64lo, r64hi, prelo, prehi,
                olo, ohi):
    x = U64(xlo[:], xhi[:])
    y = U64(ylo[:], yhi[:])
    acc = U64(alo[:], ahi[:])
    q = U64(qlo[:], qhi[:])
    mu = U64(mulo[:], muhi[:])
    r64 = U64(r64lo[:], r64hi[:])
    pre = U64(prelo[:], prehi[:])
    m = ModConsts(q, mu, r64, pre)
    out = add_mod(mul_mod(x, y, m), acc, q)
    olo[:] = out.lo
    ohi[:] = out.hi


@functools.partial(jax.jit, static_argnames=("block_n",))
def fused_mac_mod(x: U64, y: U64, acc: U64, mod: ModConsts,
                  block_n: int = BLOCK_N) -> U64:
    """(acc + x*y) mod q for [R, n] stacks, blocked through VMEM.

    mod fields must be [R, 1]-shaped (per-row constants).
    """
    R, n = x.lo.shape
    assert n % block_n == 0 or n < block_n
    bn = min(block_n, n)
    # full tower axis per block (sublane dim must be 8-divisible or whole)
    grid = (n // bn if n >= bn else 1,)

    def data_spec():
        return pl.BlockSpec((R, bn), lambda j: (0, j),
                            memory_space=pltpu.VMEM)

    def const_spec():
        return pl.BlockSpec((R, 1), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)

    specs = [data_spec()] * 6 + [const_spec()] * 8
    out_lo, out_hi = pl.pallas_call(
        _mac_kernel,
        grid=grid,
        in_specs=specs,
        out_specs=[data_spec(), data_spec()],
        out_shape=[jax.ShapeDtypeStruct((R, n), jnp.uint32)] * 2,
        interpret=jax.default_backend() != "tpu",  # CPU tests interpret
    )(x.lo, x.hi, y.lo, y.hi, acc.lo, acc.hi,
      mod.q.lo, mod.q.hi, mod.mu.lo, mod.mu.hi,
      mod.r64.lo, mod.r64.hi, mod.r64_precon.lo, mod.r64_precon.hi)
    return U64(out_lo, out_hi)
