#!/usr/bin/env python
"""Benchmark harness (driver-facing).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric: negacyclic NTT throughput at ring dim 2^16 over an 8-tower
60-bit chain (tower-NTTs per second per chip). Baseline: the reference's
published NTTTransform4096 = 47.6 us (benchmark/src/README.md:51) scaled
n log n to 2^16 => ~1015 us per tower-NTT => ~985 tower-NTTs/s on the
reference CPU. vs_baseline = our_value / baseline_value (higher is better).

Secondary metrics (stderr): CKKS EvalMult+relinearize+rescale p50 latency at
n=2^16, 8 towers (north-star op; reference CKKS_MultRelin = 3160 us at its
default 4k config — reported for context, not as the ratio).

Env knobs:
  BENCH_RING_LOG (default 16), BENCH_TOWERS (default 8),
  BENCH_SKIP_MULT=1 to skip the scheme-level phase,
  BENCH_ITERS (default 20).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_NTT_65536_US = 47.6 * (65536 * 16) / (4096 * 12)  # ~1015 us
BASELINE_CKKS_MULTRELIN_US = 3160.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    os.makedirs("/tmp/openfhe_tpu_xla_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/openfhe_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ring_log = int(os.environ.get("BENCH_RING_LOG", "16"))
    towers = int(os.environ.get("BENCH_TOWERS", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    n = 1 << ring_log

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}, n=2^{ring_log}, towers={towers}")

    from openfhe_tpu.ops import limb, ntt
    from openfhe_tpu.utils import nbtheory

    t0 = time.time()
    moduli = nbtheory.generate_prime_chain(towers, 60, n)
    plan = ntt.make_plan(n, tuple(moduli))
    log(f"plan build: {time.time()-t0:.1f}s")

    rng = np.random.default_rng(0)
    lo = rng.integers(0, 1 << 32, size=(towers, n), dtype=np.uint64).astype(np.uint32)
    hi = rng.integers(0, 1 << 27, size=(towers, n), dtype=np.uint64).astype(np.uint32)
    a = limb.U64(jax.device_put(lo), jax.device_put(hi))

    t0 = time.time()
    out = ntt.forward_jit(plan, a)
    jax.block_until_ready(out.lo)
    log(f"ntt compile+first run: {time.time()-t0:.1f}s")

    # timed loop (chain outputs to avoid overlap-hiding dispatch)
    t0 = time.time()
    x = a
    for _ in range(iters):
        x = ntt.forward_jit(plan, x)
    jax.block_until_ready(x.lo)
    dt = time.time() - t0
    per_call_us = dt / iters * 1e6
    per_tower_us = per_call_us / towers
    ntt_ops_per_s = 1e6 / per_tower_us
    log(f"NTT batch [{towers},{n}]: {per_call_us:.0f} us/call, "
        f"{per_tower_us:.1f} us/tower-NTT, {ntt_ops_per_s:.0f} tower-NTT/s")

    mult_p50_us = None
    if os.environ.get("BENCH_SKIP_MULT") != "1":
        from openfhe_tpu.models import ckks

        t0 = time.time()
        params = ckks.CKKSParams(ring_dim=n, mult_depth=towers - 1,
                                 scaling_mod_size=59, first_mod_size=60,
                                 dnum=3)
        ctx = ckks.gen_context(params)
        log(f"ckks context: {time.time()-t0:.1f}s")
        t0 = time.time()
        pk, sk = ckks.keygen(ctx, rng)
        evk = ckks.relin_keygen(ctx, sk, rng)
        log(f"ckks keygen: {time.time()-t0:.1f}s")
        t0 = time.time()
        v = rng.normal(size=n // 2)
        ct1 = ckks.encrypt(ctx, pk, v, rng)
        ct2 = ckks.encrypt(ctx, pk, v, rng)
        log(f"ckks encrypt x2: {time.time()-t0:.1f}s")

        step = jax.jit(lambda x, y, k: ckks.eval_mult_relin(x, y, k))
        t0 = time.time()
        out = step(ct1, ct2, evk)
        jax.block_until_ready(out)
        log(f"multrelin compile+first: {time.time()-t0:.1f}s")
        times = []
        for _ in range(max(5, iters // 2)):
            t0 = time.time()
            out = step(ct1, ct2, evk)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        mult_p50_us = float(np.median(times) * 1e6)
        log(f"CKKS EvalMult+Relin p50: {mult_p50_us:.0f} us "
            f"(reference CPU @4k/2towers: {BASELINE_CKKS_MULTRELIN_US} us)")

    result = {
        "metric": f"ntt_2^{ring_log}_{towers}tower_throughput_per_chip",
        "value": round(ntt_ops_per_s, 1),
        "unit": "tower-NTT/s",
        "vs_baseline": round(ntt_ops_per_s / (1e6 / BASELINE_NTT_65536_US), 2),
    }
    if mult_p50_us is not None:
        result["ckks_multrelin_p50_us"] = round(mult_p50_us, 1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
