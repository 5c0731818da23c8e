#!/usr/bin/env python
"""TPU measurement: fused Pallas four-step NTT vs the XLA four-step path.

Runs on the REAL TPU (axon platform — do not set JAX_PLATFORMS=cpu).
Asserts bit-equality between the two paths on random data, then times both
with the marginal fori_loop methodology (see bench.py docstring: wall-clock
around dispatches through the axon tunnel measures enqueue rate, so each
measurement runs k iterations inside one jit and reports the marginal cost
between two trip counts, which cancels dispatch+readback exactly).

Writes results to stdout; commit the numbers to PALLAS_BENCH.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    os.makedirs("/tmp/openfhe_tpu_xla_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/openfhe_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ring_log = int(os.environ.get("BENCH_RING_LOG", "16"))
    towers = int(os.environ.get("BENCH_TOWERS", "8"))
    k_small = int(os.environ.get("BENCH_K_SMALL", "10"))
    k_big = int(os.environ.get("BENCH_K_BIG", "60"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    n = 1 << ring_log

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}, n=2^{ring_log}, towers={towers}")

    from openfhe_tpu.ops import limb, ntt, ntt_pallas
    from openfhe_tpu.utils import nbtheory

    moduli = nbtheory.generate_prime_chain(towers, 60, n)
    plan = ntt.make_plan(n, tuple(moduli))

    rng = np.random.default_rng(0)
    lo = rng.integers(0, 1 << 32, size=(towers, n), dtype=np.uint64).astype(np.uint32)
    hi = rng.integers(0, 1 << 27, size=(towers, n), dtype=np.uint64).astype(np.uint32)
    a = limb.U64(jax.device_put(lo), jax.device_put(hi))

    mt = tuple(moduli)

    # --- bit-equality on TPU -------------------------------------------------
    t0 = time.time()
    f_xla = jax.jit(lambda x: ntt.forward(plan, x))
    f_pal = jax.jit(lambda x: ntt_pallas.forward(x, mt))
    y_xla = f_xla(a)
    y_pal = f_pal(a)
    eq_f = bool(np.array_equal(np.asarray(y_xla.lo), np.asarray(y_pal.lo))
                and np.array_equal(np.asarray(y_xla.hi), np.asarray(y_pal.hi)))
    log(f"forward bit-equal: {eq_f} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    i_xla = jax.jit(lambda x: ntt.inverse(plan, x))
    i_pal = jax.jit(lambda x: ntt_pallas.inverse(x, mt))
    z_xla = i_xla(y_xla)
    z_pal = i_pal(y_xla)
    eq_i = bool(np.array_equal(np.asarray(z_xla.lo), np.asarray(z_pal.lo))
                and np.array_equal(np.asarray(z_xla.hi), np.asarray(z_pal.hi)))
    rt = bool(np.array_equal(np.asarray(z_pal.lo), lo)
              and np.array_equal(np.asarray(z_pal.hi), hi))
    log(f"inverse bit-equal: {eq_i}, pallas round-trip exact: {rt} "
        f"({time.time()-t0:.1f}s)")

    # --- marginal timing -----------------------------------------------------
    def marginal_us(name, op):
        totals = {}
        for k in (k_small, k_big):
            f = jax.jit(lambda x, k=k: jax.lax.fori_loop(
                0, k, lambda i, v: op(v), x))
            t0 = time.time()
            np.asarray(f(a).lo[0, 0])
            log(f"  {name} k={k} compile+first: {time.time()-t0:.1f}s")
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(f(a).lo[0, 0])
                ts.append(time.perf_counter() - t0)
            totals[k] = float(np.median(ts))
        per = (totals[k_big] - totals[k_small]) / (k_big - k_small) * 1e6
        log(f"  {name}: {per:.1f} us/op")
        return per

    res = {
        "n": n, "towers": towers, "device": dev.device_kind,
        "fwd_bit_equal": eq_f, "inv_bit_equal": eq_i, "roundtrip_exact": rt,
        "xla_fwd_us": round(marginal_us("xla_fwd", lambda v: ntt.forward(plan, v)), 1),
        "pallas_fwd_us": round(marginal_us("pallas_fwd", lambda v: ntt_pallas.forward(v, mt)), 1),
        "xla_inv_us": round(marginal_us("xla_inv", lambda v: ntt.inverse(plan, v)), 1),
        "pallas_inv_us": round(marginal_us("pallas_inv", lambda v: ntt_pallas.inverse(v, mt)), 1),
    }
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
