"""Polynomial-primitive micro-benchmarks.

Mirrors the reference's ``benchmark/src/poly-benchmark-{1k,4k,16k,64k}.cpp``
case matrix: {add, mul, ntt, intt} x towers {1, 2, 4, 8} at ring dims
2^10..2^16 with 60-bit moduli (DCRTBITS=60, tow_args per
``poly-benchmark-16k.cpp:47-52``). Runs on whatever backend JAX selects
(TPU under the driver; set JAX_PLATFORMS=cpu to compare on host).

Timing: the in-graph fori_loop MARGINAL methodology shared with bench.py
(benchmarks/timing.py) — trustworthy through the non-blocking axon tunnel,
unlike wall-clock around block_until_ready.

Usage: python benchmarks/poly_benchmark.py [--ring-logs 10,12,14,16]
       [--towers 1,2,4,8]
"""

import argparse
import json
import os
import sys

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)                      # timing helper
sys.path.insert(0, os.path.dirname(_here))     # repo root
from timing import METHOD_LOOP, marginal_loop_us  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ring-logs", default="10,12,14,16")
    ap.add_argument("--towers", default="1,2,4,8")
    args = ap.parse_args()

    import jax

    # sitecustomize pins the axon (TPU tunnel) platform at interpreter
    # start; BENCH_PLATFORM=cpu reroutes to the host for comparison runs
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    cache = "/tmp/openfhe_tpu_xla_cache" + (
        "_cpu" if os.environ.get("BENCH_PLATFORM") == "cpu" else "")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openfhe_tpu.ops import limb, modular, ntt
    from openfhe_tpu.utils import nbtheory

    print(f"# device: {jax.devices()[0].device_kind}", file=sys.stderr)
    rng = np.random.default_rng(0)
    results = []
    for ring_log in map(int, args.ring_logs.split(",")):
        n = 1 << ring_log
        for towers in map(int, args.towers.split(",")):
            moduli = tuple(nbtheory.generate_prime_chain(towers, 60, n))
            plan = ntt.make_plan(n, moduli)
            mod = modular.make_mod_consts(moduli, trailing_dims=1)
            lo = rng.integers(0, 1 << 32, (towers, n),
                              dtype=np.uint64).astype(np.uint32)
            hi = rng.integers(0, 1 << 27, (towers, n),
                              dtype=np.uint64).astype(np.uint32)
            a = limb.U64(jax.device_put(lo), jax.device_put(hi))
            b = limb.U64(jax.device_put(np.roll(lo, 1, axis=-1)),
                         jax.device_put(np.roll(hi, 1, axis=-1)))

            cases = [
                ("add", lambda v: modular.add_mod(v, b, mod.q), 1 << 28),
                ("mul", lambda v: modular.mul_mod(v, b, mod), 1 << 26),
                ("ntt", lambda v: ntt.forward(plan, v), 1 << 24),
                ("intt", lambda v: ntt.inverse(plan, v), 1 << 24),
            ]
            # scale trip counts so the timed work dwarfs readback jitter
            # even for microsecond ops at small n (adds are ~ns-scale
            # device work against ~ms tunnel-readback jitter, so their
            # loops must be a couple thousand iterations deep)
            for name, body, work in cases:
                k_big = 10 + max(50, work // (n * towers))
                us = marginal_loop_us(body, a, lambda o: o.lo[0, 0],
                                      k_small=10, k_big=k_big, reps=5)
                results.append({"case": f"DCRT_{name}", "ring_log": ring_log,
                                "towers": towers, "us": round(us, 2),
                                "method": METHOD_LOOP})
                print(f"DCRT_{name:5s} n=2^{ring_log} towers={towers}: "
                      f"{us:9.2f} us", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
