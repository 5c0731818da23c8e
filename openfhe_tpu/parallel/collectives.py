"""Explicit shard_map collectives: the hand-scheduled counterpart of the
GSPMD-auto paths in ``dntt.py``.

SURVEY §2.7 maps the reference's "host is the interconnect" model to ICI
collectives. ``dntt.four_step_forward`` expresses the distributed NTT
with sharding CONSTRAINTS and lets GSPMD insert the all-to-all; this
module expresses the same algorithm inside ``jax.shard_map`` with the
collectives written out — ``lax.all_to_all`` for the four-step transpose
and ``lax.psum`` for cross-shard reductions — so the communication
schedule is explicit, inspectable, and available as a building block for
multi-host layouts. Both paths are bit-exact against ``ntt.forward``
(tests/test_collectives.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ntt
from ..ops.limb import U64
from ..ops.modular import mul_mod_shoup
from .dntt import _four_step_tables, split_factors


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)


def four_step_forward_shard_map(x: U64, moduli: tuple, mesh: Mesh,
                                axis: str = "coeff") -> U64:
    """[L, n] natural-order coefficients -> ntt.forward slot order, with
    the coefficient blocks sharded over ``axis`` and the four-step
    transpose as ONE explicit lax.all_to_all per limb plane.

    Layout: columns g[n2, L, n1] sharded on n2; after the local size-n1
    NTTs + twist, all_to_all(split n1, concat n2) re-shards on n1 — the
    ICI hop — and the size-n2 NTTs finish locally."""
    L, n = x.lo.shape
    n1, n2 = split_factors(n)
    plan1, plan2, tw, twp, _, _ = _four_step_tables(n1, n2, tuple(moduli))
    d = mesh.shape[axis]
    assert n2 % d == 0 and n1 % d == 0, (n1, n2, d)

    def local(g_lo, g_hi, tw_lo, tw_hi, twp_lo, twp_hi):
        # g: [n2/d, L, n1] — local columns
        g = ntt.forward(plan1, U64(g_lo, g_hi))
        g = mul_mod_shoup(g, U64(tw_lo, tw_hi), U64(twp_lo, twp_hi),
                          plan1.mod.q)
        # THE collective: split the n1 axis, concat on the n2 axis
        h_lo = jax.lax.all_to_all(g.lo, axis, split_axis=2, concat_axis=0,
                                  tiled=True)      # [n2, L, n1/d]
        h_hi = jax.lax.all_to_all(g.hi, axis, split_axis=2, concat_axis=0,
                                  tiled=True)
        # local transpose to rows [n1/d, L, n2] (tower axis second-to-last
        # so the plan tables broadcast) and finish
        h = U64(h_lo.transpose(2, 1, 0), h_hi.transpose(2, 1, 0))
        h = ntt.forward(plan2, h)
        return h.lo, h.hi

    # pack to the blocked layout [n2, L, n1] (whole columns contiguous)
    g_lo = jnp.moveaxis(x.lo.reshape(L, n1, n2), -1, 0)
    g_hi = jnp.moveaxis(x.hi.reshape(L, n1, n2), -1, 0)
    blk = P(axis, None, None)
    out = _shard_map(local, mesh,
                     in_specs=(blk, blk, blk, blk, blk, blk),
                     out_specs=(P(axis, None, None), P(axis, None, None)))(
        g_lo, g_hi, tw.lo, tw.hi, twp.lo, twp.hi)
    # [n1, L, n2] row-major -> [L, n] standard slot order
    h_lo, h_hi = out
    return U64(jnp.moveaxis(h_lo, 0, -2).reshape(L, n),
               jnp.moveaxis(h_hi, 0, -2).reshape(L, n))


def tower_psum(partials: jnp.ndarray, mesh: Mesh, axis: str = "tower"
               ) -> jnp.ndarray:
    """Explicit psum reduction of per-tower partial sums: partials
    [L, ...] sharded over ``axis`` -> replicated total (the reference's
    host-side gather+sum after per-DPU work, done on the interconnect).
    float/int payloads (CRT-interpolation partials, norms, diagnostics)."""

    def local(p):
        return jax.lax.psum(jnp.sum(p, axis=0), axis)

    return _shard_map(local, mesh, in_specs=P(axis),
                      out_specs=P())(partials)
