#!/usr/bin/env python
"""Benchmark harness (driver-facing).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Primary metric: negacyclic NTT throughput at ring dim 2^16 over an 8-tower
60-bit chain (tower-NTTs per second per chip), measured IN-GRAPH: the timed
loop is a lax.fori_loop chaining BENCH_INNER forward transforms inside ONE
jit, so the number reflects device execution, not the Python/remote-tunnel
dispatch rate (the round-2 harness measured 20 sequential dispatches through
the axon tunnel and collapsed under host load — VERDICT r02 weak #1).
Baseline: the reference's published NTTTransform4096 = 47.6 us
(benchmark/src/README.md:51) scaled n log n to 2^16 => ~1015 us per
tower-NTT => ~985 tower-NTTs/s on the reference CPU.
vs_baseline = our_value / baseline_value (higher is better).

Also reported in the JSON line:
  ckks_multrelin_p50_us  — dispatch-level p50 of jitted EvalMult+Relin at
                           n=2^16, 8 towers (north-star; reference
                           CKKS_MultRelin = 3160 us at its 4k default)
  ckks_multrelin_graph_us — in-graph per-iteration time of the same op
  ckks_rotate_graph_us   — in-graph per-iteration EvalRotate(1)
  ntt_dispatch_us        — per-call NTT latency including dispatch chain
  hbm_gbps               — effective HBM bandwidth assuming the minimal
                           unfused schedule (log2(n) stages x 16 B/elem)

Env knobs:
  BENCH_RING_LOG (default 16), BENCH_TOWERS (default 8),
  BENCH_SKIP_MULT=1 to skip the scheme-level phase,
  BENCH_ITERS (default 10) outer timing reps,
  BENCH_INNER (default 50) fori_loop trip count inside the jit.
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


def median_time(fn, reps):
    """Median wall time of fn() over reps calls (fn must block)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax

    os.makedirs("/tmp/openfhe_tpu_xla_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/openfhe_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ring_log = int(os.environ.get("BENCH_RING_LOG", "16"))
    towers = int(os.environ.get("BENCH_TOWERS", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    inner = int(os.environ.get("BENCH_INNER", "50"))
    n = 1 << ring_log

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}, n=2^{ring_log}, towers={towers}, "
        f"inner={inner}")

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

    # --- in-graph timed loop: `inner` chained transforms in ONE jit ---
    @jax.jit
    def ntt_loop(x):
        return jax.lax.fori_loop(
            0, inner, lambda i, v: ntt.forward(plan, v), x)

    t0 = time.time()
    jax.block_until_ready(ntt_loop(a).lo)
    log(f"ntt loop compile+first run: {time.time()-t0:.1f}s")

    dt = median_time(lambda: jax.block_until_ready(ntt_loop(a).lo), iters)
    graph_call_us = dt / inner * 1e6
    per_tower_us = graph_call_us / towers
    ntt_ops_per_s = 1e6 / per_tower_us

    # minimal-traffic roofline: log2(n) stages x (8 B read + 8 B write)/elem
    stages = ring_log
    min_bytes = stages * 16.0 * towers * n
    hbm_gbps = min_bytes / (graph_call_us * 1e-6) / 1e9

    # --- dispatch-chain number (the old methodology, for comparison) ---
    fwd = jax.jit(lambda x: ntt.forward(plan, x))
    jax.block_until_ready(fwd(a).lo)

    def chain():
        x = a
        for _ in range(inner):
            x = fwd(x)
        jax.block_until_ready(x.lo)

    dispatch_call_us = median_time(chain, max(3, iters // 3)) / inner * 1e6

    log(f"NTT batch [{towers},{n}]: in-graph {graph_call_us:.0f} us/call "
        f"({per_tower_us:.1f} us/tower-NTT, {ntt_ops_per_s:.0f} tower-NTT/s, "
        f"~{hbm_gbps:.0f} GB/s min-traffic), dispatch-chain "
        f"{dispatch_call_us:.0f} us/call")

    extra = {}
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
        log(f"ckks keygen+relin key: {time.time()-t0:.1f}s")
        t0 = time.time()
        rot_key = ckks.rot_keygen(ctx, sk, [1], rng)[1]
        log(f"ckks rot key: {time.time()-t0:.1f}s")
        t0 = time.time()
        v = rng.normal(size=n // 2)
        ct1 = ckks.encrypt(ctx, pk, v, rng)
        ct2 = ckks.encrypt(ctx, pk, v, rng)
        log(f"ckks encrypt x2: {time.time()-t0:.1f}s")

        # dispatch-level p50 (the number comparable to BENCH_r01/r02)
        step = jax.jit(lambda x, y, k: ckks.eval_mult_relin(x, y, k))
        t0 = time.time()
        jax.block_until_ready(step(ct1, ct2, evk))
        log(f"multrelin compile+first: {time.time()-t0:.1f}s")
        times = []
        for _ in range(max(7, iters)):
            t0 = time.perf_counter()
            jax.block_until_ready(step(ct1, ct2, evk))
            times.append(time.perf_counter() - t0)
        mult_p50_us = float(np.median(times) * 1e6)

        # in-graph: fori_loop over mult+relin (fresh Ciphertext per iter so
        # the static scale metadata stays constant across the carry)
        mr_inner = max(4, inner // 8)

        @jax.jit
        def mult_loop(polys, other, key):
            def body(i, cv):
                ct = ckks.Ciphertext(cv, 1.0)
                return ckks.eval_mult_relin(ct, other, key).polys
            return jax.lax.fori_loop(0, mr_inner, body, polys)

        ct1_flat = ckks.Ciphertext(ct1.polys, 1.0)
        ct2_flat = ckks.Ciphertext(ct2.polys, 1.0)
        t0 = time.time()
        jax.block_until_ready(mult_loop(ct1_flat.polys, ct2_flat, evk)[0].lo)
        log(f"multrelin loop compile: {time.time()-t0:.1f}s")
        dt = median_time(
            lambda: jax.block_until_ready(
                mult_loop(ct1_flat.polys, ct2_flat, evk)[0].lo),
            max(3, iters // 2))
        mult_graph_us = dt / mr_inner * 1e6

        # in-graph rotation
        @jax.jit
        def rot_loop(polys, key):
            def body(i, cv):
                ct = ckks.Ciphertext(cv, 1.0)
                return ckks.eval_rotate(ct, 1, key).polys
            return jax.lax.fori_loop(0, mr_inner, body, polys)

        t0 = time.time()
        jax.block_until_ready(rot_loop(ct1_flat.polys, rot_key)[0].lo)
        log(f"rotate loop compile: {time.time()-t0:.1f}s")
        dt = median_time(
            lambda: jax.block_until_ready(
                rot_loop(ct1_flat.polys, rot_key)[0].lo),
            max(3, iters // 2))
        rot_graph_us = dt / mr_inner * 1e6

        log(f"CKKS EvalMult+Relin: p50 dispatch {mult_p50_us:.0f} us, "
            f"in-graph {mult_graph_us:.0f} us; EvalRotate in-graph "
            f"{rot_graph_us:.0f} us "
            f"(reference CPU @4k/2towers: {BASELINE_CKKS_MULTRELIN_US} us)")
        extra = {
            "ckks_multrelin_p50_us": round(mult_p50_us, 1),
            "ckks_multrelin_graph_us": round(mult_graph_us, 1),
            "ckks_rotate_graph_us": round(rot_graph_us, 1),
        }

    result = {
        "metric": f"ntt_2^{ring_log}_{towers}tower_throughput_per_chip",
        "value": round(ntt_ops_per_s, 1),
        "unit": "tower-NTT/s",
        "vs_baseline": round(ntt_ops_per_s / (1e6 / BASELINE_NTT_65536_US), 2),
        "ntt_dispatch_us": round(dispatch_call_us, 1),
        "hbm_gbps": round(hbm_gbps, 1),
        **extra,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
