"""Scheme-level benchmark suite.

Mirrors the reference's ``benchmark/src/lib-benchmark.cpp`` case matrix:
{BFV, BGV, CKKS} x {KeyGen, RelinKeyGen, Encrypt, Decrypt, Add, MultNoRelin,
MultRelin, Relin, Rescale/ModReduce, Rotate}. Reports microseconds per op
(median of --iters timed runs after a warmup/compile run).

Usage: python benchmarks/lib_benchmark.py [--ring-log 12] [--iters 10]
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def timed(fn, iters):
    import jax
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    return float(np.median(ts) * 1e6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ring-log", type=int, default=12)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    os.makedirs("/tmp/openfhe_tpu_xla_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/openfhe_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"# device: {jax.devices()[0].device_kind}", file=sys.stderr)

    n = 1 << args.ring_log
    rng = np.random.default_rng(0)
    results = {}

    def rec(name, us):
        results[name] = round(us, 1)
        print(f"{name:24s} {us:10.1f} us", file=sys.stderr)

    # ---- CKKS ----
    from openfhe_tpu.models import ckks
    params = ckks.CKKSParams(ring_dim=n, mult_depth=3, scaling_mod_size=50,
                             first_mod_size=60, dnum=2)
    ctx = ckks.gen_context(params)
    t0 = time.time()
    pk, sk = ckks.keygen(ctx, rng)
    rec("CKKS_KeyGen", (time.time() - t0) * 1e6)
    t0 = time.time()
    evk = ckks.relin_keygen(ctx, sk, rng)
    rec("CKKS_MultKeyGen", (time.time() - t0) * 1e6)
    rk = ckks.rot_keygen(ctx, sk, [1], rng)[1]
    v = rng.normal(size=n // 2)
    t0 = time.time()
    ct1 = ckks.encrypt(ctx, pk, v, rng)
    rec("CKKS_Encryption", (time.time() - t0) * 1e6)
    ct2 = ckks.encrypt(ctx, pk, v, rng)
    t0 = time.time()
    ckks.decrypt(ctx, sk, ct1)
    rec("CKKS_Decryption", (time.time() - t0) * 1e6)
    rec("CKKS_Add", timed(lambda: ckks.eval_add(ct1, ct2), args.iters))
    rec("CKKS_MultNoRelin", timed(lambda: ckks.eval_mult(ct1, ct2), args.iters))
    rec("CKKS_MultRelin",
        timed(lambda: ckks.eval_mult_relin(ct1, ct2, evk), args.iters))
    ctm = ckks.eval_mult(ct1, ct2)
    rec("CKKS_Relin", timed(lambda: ckks.relinearize(ctm, evk), args.iters))
    ctr = ckks.eval_mult_relin(ct1, ct2, evk)
    rec("CKKS_Rescale", timed(lambda: ckks.rescale(ctr), args.iters))
    rec("CKKS_EvalAtIndex",
        timed(lambda: ckks.eval_rotate(ct1, 1, rk), args.iters))

    # ---- BGV ----
    from openfhe_tpu.models import bgv
    bparams = bgv.BGVParams(ring_dim=n, mult_depth=2,
                            plaintext_modulus=65537, mod_size=55, dnum=2)
    bctx = bgv.gen_context(bparams)
    t0 = time.time()
    bpk, bsk = bgv.keygen(bctx, rng)
    rec("BGV_KeyGen", (time.time() - t0) * 1e6)
    bevk = bgv.relin_keygen(bctx, bsk, rng)
    bv = [int(x) for x in rng.integers(0, 65537, size=n)]
    t0 = time.time()
    bct1 = bgv.encrypt(bctx, bpk, bv, rng)
    rec("BGV_Encryption", (time.time() - t0) * 1e6)
    bct2 = bgv.encrypt(bctx, bpk, bv, rng)
    rec("BGV_Add", timed(lambda: bgv.eval_add(bct1, bct2), args.iters))
    rec("BGV_MultRelin",
        timed(lambda: bgv.eval_mult_relin(bct1, bct2, bevk), args.iters))
    bctm = bgv.eval_mult_relin(bct1, bct2, bevk)
    rec("BGV_ModSwitch", timed(lambda: bgv.mod_reduce(bctx, bctm), args.iters))

    # ---- BFV ----
    from openfhe_tpu.models import bfv
    fparams = bfv.BFVParams(ring_dim=n, plaintext_modulus=65537,
                            num_towers=3, mod_size=60, dnum=2)
    fctx = bfv.gen_context(fparams)
    t0 = time.time()
    fpk, fsk = bfv.keygen(fctx, rng)
    rec("BFV_KeyGen", (time.time() - t0) * 1e6)
    fevk = bfv.relin_keygen(fctx, fsk, rng)
    t0 = time.time()
    fct1 = bfv.encrypt(fctx, fpk, bv, rng)
    rec("BFV_Encryption", (time.time() - t0) * 1e6)
    fct2 = bfv.encrypt(fctx, fpk, bv, rng)
    rec("BFV_Add", timed(lambda: bfv.eval_add(fct1, fct2), args.iters))
    rec("BFV_MultNoRelin",
        timed(lambda: bfv.eval_mult(fctx, fct1, fct2), args.iters))
    rec("BFV_MultRelin",
        timed(lambda: bfv.eval_mult_relin(fctx, fct1, fct2, fevk), args.iters))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
