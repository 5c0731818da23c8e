#!/usr/bin/env python
"""Composite EvalRotate regression diagnosis (round 5).

BENCH_r04: composite EvalRotate = 8536 us vs 2153 us on the u64 path,
while MultRelin is flat — something specific to rotate at 16 towers.
This script times each piece of the rotate pipeline separately on the
real TPU with the marginal fori_loop methodology:

  1. the EVAL-form automorphism gather on [L, n] (c0 and c1)
  2. hoist_decompose (iNTT + per-digit basis switch + fwd NTT over QP)
  3. hoist_inner_product (digit x key MAC + 2 mod-downs)
  4. the full eval_rotate

Run on TPU: ``python tpu_diag_rotate.py`` (never concurrently with
bench.py). Env: DIAG_RING_LOG (16), DIAG_COMPOSITE (1).
"""

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

    from openfhe_tpu import dcrt, keyswitch
    from openfhe_tpu.models import ckks

    n = 1 << int(os.environ.get("DIAG_RING_LOG", "16"))
    composite = os.environ.get("DIAG_COMPOSITE", "1") == "1"
    towers = 8
    rng = np.random.default_rng(7)
    k_small, k_big = 6, 30

    def marginal_us(name, loop_fn, probe):
        totals = {}
        for k in (k_small, k_big):
            f = loop_fn(k)
            t0 = time.time()
            out = f()
            probe(out)
            totals[k] = None  # compile+first
            log(f"  {name} k={k} compile+first: {time.time()-t0:.1f}s")
            best = 1e18
            for _ in range(3):
                t0 = time.time()
                out = f()
                probe(out)
                best = min(best, time.time() - t0)
            totals[k] = best
        us = (totals[k_big] - totals[k_small]) / (k_big - k_small) * 1e6
        log(f"  {name}: {us:.1f} us/op")
        return us

    params = ckks.CKKSParams(ring_dim=n, mult_depth=towers - 1,
                             scaling_mod_size=59, first_mod_size=60,
                             dnum=3,
                             composite_degree=2 if composite else 1)
    ctx = ckks.gen_context(params)
    pk, sk = ckks.keygen(ctx, rng)
    rot_key = ckks.rot_keygen(ctx, sk, [1], rng)[1]
    log(f"context ready: {len(ctx.q_moduli)} towers of "
        f"~{max(ctx.q_moduli).bit_length()} bits, "
        f"{len(ctx.p_moduli)} special")
    v = rng.normal(size=n // 2)
    ct = ckks.Ciphertext(ckks.encrypt(ctx, pk, v, rng).polys, 1.0)
    c1 = ct.polys[1]
    basis = c1.basis
    galois = ckks.rotation_indices_to_galois(n, 1)

    def auto_loop(k):
        @jax.jit
        def f(p):
            def body(i, d):
                return dcrt.automorphism(
                    dcrt.make_poly(basis, d, dcrt.Format.EVAL), galois).data
            return jax.lax.fori_loop(0, k, body, p)
        return lambda: f(c1.data)

    def decomp_loop(k):
        @jax.jit
        def f(p):
            def body(i, d):
                digits = keyswitch.hoist_decompose(
                    rot_key.params,
                    dcrt.make_poly(basis, d, dcrt.Format.EVAL))
                # fold digits back to [L, n] so the loop carry is stable
                return type(d)(digits.lo[0][: basis.L],
                               digits.hi[0][: basis.L])
            return jax.lax.fori_loop(0, k, body, p)
        return lambda: f(c1.data)

    digits0 = keyswitch.hoist_decompose(rot_key.params, c1)

    def inner_loop(k):
        @jax.jit
        def f(dg):
            def body(i, d):
                d0, d1 = keyswitch.hoist_inner_product(rot_key, d, basis)
                lo = dg.lo.at[0, : basis.L].set(d0.lo)
                hi = dg.hi.at[0, : basis.L].set(d0.hi)
                return type(d)(lo, hi)
            return jax.lax.fori_loop(0, k, body, dg)
        return lambda: f(digits0)

    def rotate_loop(k):
        @jax.jit
        def f(polys, key):
            def body(i, cv):
                c = ckks.Ciphertext(cv, 1.0)
                return ckks.eval_rotate(c, 1, key).polys
            return jax.lax.fori_loop(0, k, body, polys)
        return lambda: f(ct.polys, rot_key)

    auto_us = marginal_us("automorph[L,n]", auto_loop,
                          lambda o: np.asarray(o.lo[0, 0]))
    dec_us = marginal_us("hoist_decompose", decomp_loop,
                         lambda o: np.asarray(o.lo[0, 0]))
    inner_us = marginal_us("inner+moddown", inner_loop,
                           lambda o: np.asarray(o.lo[0, 0]))
    rot_us = marginal_us("eval_rotate", rotate_loop,
                         lambda o: np.asarray(o[0].lo[0, 0]))
    print(f"{{\"auto_us\": {auto_us:.1f}, \"decompose_us\": {dec_us:.1f}, "
          f"\"inner_us\": {inner_us:.1f}, \"rotate_us\": {rot_us:.1f}}}")


if __name__ == "__main__":
    main()
