"""Polynomial-primitive micro-benchmarks.

Mirrors the reference's ``benchmark/src/poly-benchmark-{1k,4k,16k,64k}.cpp``
case matrix: {add, mul, ntt, intt} x towers {1, 2, 4, 8} at ring dims
2^10..2^16 with 60-bit moduli (DCRTBITS=60, tow_args per
``poly-benchmark-16k.cpp:47-52``). Runs on whatever backend JAX selects
(TPU under the driver; set JAX_PLATFORMS=cpu to compare on host).

Usage: python benchmarks/poly_benchmark.py [--ring-logs 10,12,14,16]
       [--towers 1,2,4,8] [--iters 50]
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ring-logs", default="10,12,14,16")
    ap.add_argument("--towers", default="1,2,4,8")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax

    os.makedirs("/tmp/openfhe_tpu_xla_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/openfhe_tpu_xla_cache")
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
            b = limb.U64(jax.device_put(hi), jax.device_put(lo))

            add_fn = jax.jit(lambda x, y: modular.add_mod(x, y, mod.q))
            mul_fn = jax.jit(lambda x, y: modular.mul_mod(x, y, mod))
            fwd = lambda x: ntt.forward_jit(plan, x)
            inv = lambda x: ntt.inverse_jit(plan, x)

            for name, fn, nargs in [("add", add_fn, 2), ("mul", mul_fn, 2),
                                    ("ntt", fwd, 1), ("intt", inv, 1)]:
                out = fn(a, b) if nargs == 2 else fn(a)
                jax.block_until_ready(out.lo)
                t0 = time.time()
                x = a
                for _ in range(args.iters):
                    x = fn(x, b) if nargs == 2 else fn(x)
                jax.block_until_ready(x.lo)
                us = (time.time() - t0) / args.iters * 1e6
                results.append({"case": f"DCRT_{name}", "ring_log": ring_log,
                                "towers": towers, "us": round(us, 2)})
                print(f"DCRT_{name:5s} n=2^{ring_log} towers={towers}: "
                      f"{us:9.2f} us", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
