#!/usr/bin/env python
"""Rotate pathology fix candidates (see tpu_diag_rotate.py).

Variant A: current eval_rotate (gather -> full keyswitch in one graph).
Variant B: same + jax.lax.optimization_barrier after the automorphisms.
Variant C: decompose FIRST, then permute the digit stack + c0 and
inner-product (the reference's EvalFastRotation order) — the gather
never feeds an NTT directly.
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
    v = rng.normal(size=n // 2)
    ct = ckks.Ciphertext(ckks.encrypt(ctx, pk, v, rng).polys, 1.0)
    galois = ckks.rotation_indices_to_galois(n, 1)

    def rot_a(c, key):
        return ckks.eval_rotate(c, 1, key)

    def rot_b(c, key):
        c0 = dcrt.automorphism(c.polys[0], galois)
        c1 = dcrt.automorphism(c.polys[1], galois)
        c0, c1 = jax.lax.optimization_barrier((c0, c1))
        d0, d1 = keyswitch.apply(key, c1)
        return ckks.Ciphertext((dcrt.add(c0, d0), d1), c.scale)

    def rot_c(c, key):
        digits = keyswitch.hoist_decompose(key.params, c.polys[1])
        c0 = dcrt.automorphism(c.polys[0], galois)
        d0, d1 = keyswitch.hoist_rotate_apply(key, digits, c.basis, galois)
        return ckks.Ciphertext((dcrt.add(c0, d0), d1), c.scale)

    for name, fn in [("A-current", rot_a), ("B-barrier", rot_b),
                     ("C-hoisted", rot_c)]:
        def loop(k, fn=fn):
            @jax.jit
            def f(polys, key):
                def body(i, cv):
                    return fn(ckks.Ciphertext(cv, 1.0), key).polys
                return jax.lax.fori_loop(0, k, body, polys)
            return lambda: f(ct.polys, rot_key)

        us = marginal_us(name, loop, lambda o: np.asarray(o[0].lo[0, 0]))
        print(f"{name}: {us:.1f} us", flush=True)


if __name__ == "__main__":
    main()
