"""Scheme-level benchmark suite.

Mirrors the reference's ``benchmark/src/lib-benchmark.cpp`` case matrix:
{BFV, BGV, CKKS} x {KeyGen, RelinKeyGen, Encrypt, Decrypt, Add, MultNoRelin,
MultRelin, Relin, Rescale/ModReduce, Rotate}.

Timing: the marginal methodology shared with bench.py
(benchmarks/timing.py) — wall-clock around block_until_ready measures
enqueue rate through the non-blocking axon tunnel, so hot ops run as
in-graph fori_loops (structure-preserving bodies) or data-chained
dispatch streams, both with forced readbacks; every JSON record carries
its ``method`` tag. One-shot host+device paths (keygen/encrypt/decrypt,
which do host CRT work) report warm wall-clock, as google-benchmark does
for the reference's KeyGen cases.

Usage: python benchmarks/lib_benchmark.py [--ring-log 12]
"""

import argparse
import json
import os
import sys

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)                      # timing helper
sys.path.insert(0, os.path.dirname(_here))     # repo root
from timing import (  # noqa: E402
    METHOD_LOOP,
    METHOD_ONESHOT,
    METHOD_STREAM,
    marginal_loop_us,
    marginal_stream_us,
    oneshot_s,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ring-log", type=int, default=12)
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
    print(f"# device: {jax.devices()[0].device_kind}", file=sys.stderr)

    n = 1 << args.ring_log
    rng = np.random.default_rng(0)
    results = {}

    def rec(name, us, method):
        results[name] = {"us": round(us, 1), "method": method}
        print(f"{name:24s} {us:12.1f} us  [{method}]", file=sys.stderr)

    # ---- CKKS ----
    from openfhe_tpu.models import ckks
    params = ckks.CKKSParams(ring_dim=n, mult_depth=3, scaling_mod_size=50,
                             first_mod_size=60, dnum=2)
    ctx = ckks.gen_context(params)
    pk, sk = ckks.keygen(ctx, rng)  # warm the kernels once
    rec("CKKS_KeyGen",
        oneshot_s(lambda: ckks.keygen(ctx, rng)) * 1e6, METHOD_ONESHOT)
    evk = ckks.relin_keygen(ctx, sk, rng)
    rec("CKKS_MultKeyGen",
        oneshot_s(lambda: ckks.relin_keygen(ctx, sk, rng)) * 1e6,
        METHOD_ONESHOT)
    rk = ckks.rot_keygen(ctx, sk, [1], rng)[1]
    v = rng.normal(size=n // 2)
    ct1 = ckks.encrypt(ctx, pk, v, rng)
    rec("CKKS_Encryption",
        oneshot_s(lambda: ckks.encrypt(ctx, pk, v, rng)) * 1e6,
        METHOD_ONESHOT)
    ct2 = ckks.encrypt(ctx, pk, v, rng)
    ckks.decrypt(ctx, sk, ct1)
    rec("CKKS_Decryption",
        oneshot_s(lambda: ckks.decrypt(ctx, sk, ct1)) * 1e6, METHOD_ONESHOT)

    def probe(ct):
        return ct.polys[0].data.lo[0, 0]

    rec("CKKS_Add",
        # cheap op: long trip counts so the marginal clears readback noise
        marginal_loop_us(lambda c: ckks.eval_add(c, ct2), ct1, probe,
                         k_small=50, k_big=500),
        METHOD_LOOP)
    rec("CKKS_MultRelin",
        # reset the (static-metadata) scale so the fori_loop carry matches
        marginal_loop_us(lambda c: ckks.Ciphertext(
            ckks.eval_mult_relin(c, ct2, evk).polys, c.scale), ct1, probe),
        METHOD_LOOP)
    rec("CKKS_EvalAtIndex",
        marginal_loop_us(lambda c: ckks.eval_rotate(c, 1, rk), ct1, probe),
        METHOD_LOOP)
    # structure-changing ops: dispatch stream (in-order device queue +
    # one forced readback still sums all device work)
    rec("CKKS_MultNoRelin",
        marginal_stream_us(lambda c: ckks.eval_mult(ct1, ct2), ct1, probe),
        METHOD_STREAM)
    ctm = ckks.eval_mult(ct1, ct2)
    rec("CKKS_Relin",
        marginal_stream_us(lambda c: ckks.relinearize(ctm, evk), ctm, probe),
        METHOD_STREAM)
    ctr = ckks.eval_mult_relin(ct1, ct2, evk)
    rec("CKKS_Rescale",
        marginal_stream_us(lambda c: ckks.rescale(ctr), ctr, probe),
        METHOD_STREAM)

    # ---- BGV ----
    from openfhe_tpu.models import bgv
    bparams = bgv.BGVParams(ring_dim=n, mult_depth=2,
                            plaintext_modulus=65537, mod_size=55, dnum=2)
    bctx = bgv.gen_context(bparams)
    bpk, bsk = bgv.keygen(bctx, rng)
    rec("BGV_KeyGen",
        oneshot_s(lambda: bgv.keygen(bctx, rng)) * 1e6, METHOD_ONESHOT)
    bevk = bgv.relin_keygen(bctx, bsk, rng)
    bv = [int(x) for x in rng.integers(0, 65537, size=n)]
    bct1 = bgv.encrypt(bctx, bpk, bv, rng)
    rec("BGV_Encryption",
        oneshot_s(lambda: bgv.encrypt(bctx, bpk, bv, rng)) * 1e6,
        METHOD_ONESHOT)
    bct2 = bgv.encrypt(bctx, bpk, bv, rng)

    def bprobe(ct):
        return ct.polys[0].data.lo[0, 0]

    rec("BGV_Add",
        marginal_loop_us(lambda c: bgv.eval_add(c, bct2), bct1, bprobe,
                         k_small=50, k_big=500),
        METHOD_LOOP)
    rec("BGV_MultRelin",
        marginal_loop_us(lambda c: bgv.eval_mult_relin(c, bct2, bevk),
                         bct1, bprobe), METHOD_LOOP)
    bctm = bgv.eval_mult_relin(bct1, bct2, bevk)
    rec("BGV_ModSwitch",
        marginal_stream_us(lambda c: bgv.mod_reduce(bctx, bctm), bctm,
                           bprobe), METHOD_STREAM)

    # ---- BFV ----
    from openfhe_tpu.models import bfv
    fparams = bfv.BFVParams(ring_dim=n, plaintext_modulus=65537,
                            num_towers=3, mod_size=60, dnum=2)
    fctx = bfv.gen_context(fparams)
    fpk, fsk = bfv.keygen(fctx, rng)
    rec("BFV_KeyGen",
        oneshot_s(lambda: bfv.keygen(fctx, rng)) * 1e6, METHOD_ONESHOT)
    fevk = bfv.relin_keygen(fctx, fsk, rng)
    fct1 = bfv.encrypt(fctx, fpk, bv, rng)
    rec("BFV_Encryption",
        oneshot_s(lambda: bfv.encrypt(fctx, fpk, bv, rng)) * 1e6,
        METHOD_ONESHOT)
    fct2 = bfv.encrypt(fctx, fpk, bv, rng)
    rec("BFV_Add",
        marginal_loop_us(lambda c: bfv.eval_add(c, fct2), fct1, bprobe,
                         k_small=50, k_big=500),
        METHOD_LOOP)
    rec("BFV_MultRelin",
        # reset the (static-metadata) noise_deg so the fori_loop carry
        # structure matches, as the CKKS case does for scale
        marginal_loop_us(
            lambda c: bfv.Ciphertext(
                bfv.eval_mult_relin(fctx, c, fct2, fevk).polys,
                c.noise_deg), fct1,
            bprobe), METHOD_LOOP)
    rec("BFV_MultNoRelin",
        marginal_stream_us(lambda c: bfv.eval_mult(fctx, fct1, fct2),
                           fct1, bprobe), METHOD_STREAM)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
