"""BINFHE gate benchmark suite.

Mirrors the reference's ``benchmark/src/binfhe-{ginx,ap,lmkcdey}.cpp``
binaries: bootstrap keygen time and per-gate latency/throughput for each
blind-rotation method. GINX/AP additionally report the batched-gate
throughput (the TPU amortization the reference cannot do).

Usage: python benchmarks/binfhe_benchmark.py [--set TOY] [--iters 5]
       [--batch 16] [--methods GINX,AP,LMKCDEY] [--cpu]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", default="TOY", choices=["TOY", "STD128"])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--methods", default="GINX,AP,LMKCDEY")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import os
    os.makedirs("/tmp/openfhe_tpu_xla_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/openfhe_tpu_xla_cache")

    import dataclasses

    from openfhe_tpu.models import binfhe

    rng = np.random.default_rng(0)
    results = {}
    for method in args.methods.split(","):
        base = binfhe.PARAM_SETS[args.set]()
        params = dataclasses.replace(base, method="GINX" if method == "GINX"
                                     else ("AP" if method == "AP"
                                           else "LMKCDEY"))
        ctx = binfhe.gen_context(params)
        sk = binfhe.keygen(ctx, rng)
        t0 = time.time()
        bk = binfhe.bootstrap_keygen(ctx, sk, rng)
        jax.block_until_ready(bk.ek_lo)
        keygen_s = time.time() - t0

        ct1 = binfhe.encrypt(ctx, sk, 1, rng)
        ct2 = binfhe.encrypt(ctx, sk, 0, rng)
        # warmup/compile
        binfhe.eval_gate(ctx, "AND", bk, ct1, ct2)
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            binfhe.eval_gate(ctx, "AND", bk, ct1, ct2)
            ts.append(time.time() - t0)
        single_ms = float(np.median(ts) * 1e3)

        entry = {"keygen_s": round(keygen_s, 2),
                 "gate_ms": round(single_ms, 2)}
        if method != "LMKCDEY":
            B = args.batch
            cts1 = [binfhe.encrypt(ctx, sk, 1, rng) for _ in range(B)]
            cts2 = [binfhe.encrypt(ctx, sk, 0, rng) for _ in range(B)]
            binfhe.eval_gate_batch(ctx, "AND", bk, cts1, cts2)  # compile
            t0 = time.time()
            binfhe.eval_gate_batch(ctx, "AND", bk, cts1, cts2)
            batch_s = time.time() - t0
            entry["batched_gates_per_s"] = round(B / batch_s, 1)
        results[method] = entry
        print(f"{method}: {entry}", flush=True)

    print(json.dumps({"set": args.set, "results": results}))


if __name__ == "__main__":
    main()
