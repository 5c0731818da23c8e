"""Device-mesh sharding for RNS-FHE workloads.

Replaces the reference's two parallelism mechanisms (OpenMP tower loops and
the host->DPU scatter/gather offload, SURVEY §2.7) with jax.sharding over a
2-D mesh:

* axis "tower": RNS towers are embarrassingly parallel for elementwise ops
  and per-tower NTTs — the analog of the reference's OpenMP-over-towers and
  of the abandoned PIM design's tower-group scatter
  (``pim/host/PimManager-Impl.cpp:47-66``).
* axis "coeff": ring coefficients; elementwise ops shard freely, NTT stages
  with cross-shard strides induce ICI collectives (XLA GSPMD inserts them).

Ciphertext arrays are [L, n] per limb, so PartitionSpec("tower", "coeff")
shards both. Scalars/tables are replicated constants.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None,
              tower_par: int | None = None) -> Mesh:
    """Build a ("tower", "coeff") mesh over the first n_devices devices.

    tower_par defaults to the largest power-of-two <= min(4, n_devices).
    """
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    nd = len(devs)
    if tower_par is None:
        tower_par = 1
        while tower_par * 2 <= min(4, nd) and nd % (tower_par * 2) == 0:
            tower_par *= 2
    assert nd % tower_par == 0
    arr = np.asarray(devs).reshape(tower_par, nd // tower_par)
    return Mesh(arr, ("tower", "coeff"))


def poly_sharding(mesh: Mesh, shape: Sequence[int] | None = None
                  ) -> NamedSharding:
    """Sharding for [L, n] tower-major polynomial limb arrays.

    With a shape, axes that do not divide the mesh axis degrade to
    replicated (device_put requires exact divisibility; this mirrors
    shard_poly_pytree so helpers never hard-fail on small tower counts).
    """
    if shape is None:
        return NamedSharding(mesh, P("tower", "coeff"))
    spec = [None] * len(shape)
    if shape[-1] % mesh.shape["coeff"] == 0:
        spec[-1] = "coeff"
    if len(shape) >= 2 and shape[-2] % mesh.shape["tower"] == 0:
        spec[-2] = "tower"
    return NamedSharding(mesh, P(*spec))


def shard_limbs(x, mesh: Mesh):
    """device_put a U64 limb pair (or any .lo/.hi holder) with tower/coeff
    sharding where the dimensions divide; non-divisible axes replicate."""
    from ..ops.limb import U64

    sh = poly_sharding(mesh, x.lo.shape)
    return U64(jax.device_put(x.lo, sh), jax.device_put(x.hi, sh))


def digit_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [dnum, L, n] stacked keyswitch keys."""
    return NamedSharding(mesh, P(None, "tower", "coeff"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_poly_pytree(tree, mesh: Mesh):
    """device_put leaves with tower/coeff shardings where dimensions divide
    the mesh axes (device_put requires exact divisibility; axes that don't
    divide stay replicated — inside jit GSPMD re-shards freely)."""
    tp = mesh.shape["tower"]
    cp = mesh.shape["coeff"]

    def put(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2:
            spec = [None] * leaf.ndim
            if leaf.shape[-1] % cp == 0:
                spec[-1] = "coeff"
            if leaf.shape[-2] % tp == 0:
                spec[-2] = "tower"
            return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))
        return jax.device_put(leaf, replicated(mesh))

    return jax.tree_util.tree_map(put, tree)
