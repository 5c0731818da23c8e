#!/usr/bin/env python
"""Measure the MXU digit-matmul ApproxSwitchCRTBasis (ops/rns_mxu.py)
against the VPU u32 path at the composite keyswitch shapes:
digit mod-up (6 -> 16 rows) and mod-down (6 <- 16) at n = 2^16.
Records the numbers for NTT_PERF.md regardless of winner."""

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    os.makedirs("/tmp/openfhe_tpu_xla_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/openfhe_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openfhe_tpu.ops import limb, rns, rns_mxu
    from openfhe_tpu.utils import nbtheory

    n = 1 << 16
    rng = np.random.default_rng(0)
    results = {}
    for L, K in [(6, 16), (16, 6), (16, 22)]:
        from_m = tuple(nbtheory.generate_prime_chain(L, 30, n))
        to_m = tuple(nbtheory.generate_prime_chain(K, 29, n,
                                                   avoid=list(from_m)))
        x_np = np.stack([rng.integers(0, q, size=n, dtype=np.uint64)
                         for q in from_m])
        x = limb.U64(jax.device_put(limb.from_int_array(x_np).lo),
                     jax.device_put(np.zeros((L, n), np.uint32)))

        for name, fn in [("vpu", rns.approx_switch_basis),
                         ("mxu", rns_mxu.approx_switch_basis_mxu)]:
            def loop(k):
                @jax.jit
                def f(v):
                    def body(i, d):
                        out = fn(limb.U64(d, jax.numpy.zeros_like(d)),
                                 from_m, to_m)
                        # fold back to [L, n] so the carry is stable
                        return out.lo[:L] if K >= L else \
                            jax.numpy.concatenate([out.lo, d[K:]], axis=0)
                    return jax.lax.fori_loop(0, k, body, v)
                return lambda: f(x.lo)

            totals = {}
            for k in (6, 30):
                f = loop(k)
                np.asarray(f()[0, 0])
                best = 1e18
                for _ in range(4):
                    t0 = time.time()
                    np.asarray(f()[0, 0])
                    best = min(best, time.time() - t0)
                totals[k] = best
            us = (totals[30] - totals[6]) / 24 * 1e6
            results[f"{name}_{L}to{K}"] = round(us, 1)
            log(f"  switch_basis {L}->{K} [{name}]: {us:.1f} us")
    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
