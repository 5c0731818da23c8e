#!/usr/bin/env python
"""Simulated multi-HOST dryrun: 2 jax.distributed processes x 4 CPU devices.

The closest this 1-chip environment can get to the DCN claim: the same
mult+relin+rescale step as ``__graft_entry__.dryrun_multichip``, but over a
GLOBAL 8-device mesh whose devices are split across two OS processes, so
every cross-shard collective exercises the multi-process (multi-host) code
path of GSPMD rather than the single-process fast path. Each process also
computes the full result UNSHARDED on its local default device and asserts
its addressable shards of the distributed output are bit-equal.

Run: ``python multihost_dryrun.py`` (spawns the two workers, checks both
exit 0 and print their shard-equality lines). Results are recorded in
MULTIHOST_DRYRUN.md.
"""

import os
import subprocess
import sys

PORT = int(os.environ.get("MULTIHOST_PORT", "8476"))
NPROC = 2
LOCAL_DEVICES = 4


def worker(pid: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs("/tmp/openfhe_tpu_xla_cache_cpu", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/openfhe_tpu_xla_cache_cpu")
    jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                               num_processes=NPROC, process_id=pid)
    assert jax.process_count() == NPROC
    assert len(jax.local_devices()) == LOCAL_DEVICES
    assert len(jax.devices()) == NPROC * LOCAL_DEVICES

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from __graft_entry__ import _build

    ckks, ctx, ct1, ct2, evk = _build(ring_dim=256, mult_depth=3,
                                      scaling_mod_size=40, first_mod_size=50,
                                      dnum=2)

    def step(a, b, key):
        return ckks.rescale(ckks.eval_mult_relin(a, b, key))

    # local unsharded reference (runs on this process's default device)
    expected = jax.tree_util.tree_map(
        np.asarray, jax.jit(step)(ct1, ct2, evk),
        is_leaf=lambda x: hasattr(x, "ndim"))

    # global 2x4 ("tower", "coeff") mesh spanning both processes
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("tower", "coeff"))

    def shard(tree):
        def put(leaf):
            if hasattr(leaf, "ndim") and leaf.ndim >= 2:
                spec = [None] * leaf.ndim
                if leaf.shape[-1] % mesh.shape["coeff"] == 0:
                    spec[-1] = "coeff"
                if leaf.shape[-2] % mesh.shape["tower"] == 0:
                    spec[-2] = "tower"
                sh = NamedSharding(mesh, P(*spec))
            else:
                sh = NamedSharding(mesh, P())
            host = np.asarray(leaf)
            return jax.make_array_from_callback(
                host.shape, sh, lambda idx: host[idx])
        return jax.tree_util.tree_map(put, tree)

    out = jax.jit(step)(shard(ct1), shard(ct2), shard(evk))
    jax.block_until_ready(out)

    # every addressable shard must equal the matching slice of the local
    # unsharded result, bitwise
    flat_out, _ = jax.tree_util.tree_flatten(out)
    flat_exp, _ = jax.tree_util.tree_flatten(expected)
    checked = 0
    for got, want in zip(flat_out, flat_exp):
        if not hasattr(got, "addressable_shards"):
            continue
        for s in got.addressable_shards:
            assert np.array_equal(np.asarray(s.data), want[s.index]), \
                f"shard mismatch at {s.index}"
            checked += 1
    print(f"[proc {pid}] multihost dryrun ok: {jax.process_count()} procs x "
          f"{LOCAL_DEVICES} devices, {checked} addressable shards bit-equal",
          flush=True)


def main() -> None:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen([sys.executable, __file__, "--worker", str(i)],
                              env=env) for i in range(NPROC)]
    rcs = [p.wait(timeout=1800) for p in procs]
    assert rcs == [0] * NPROC, f"worker exit codes: {rcs}"
    print("multihost dryrun: PASSED")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        main()
