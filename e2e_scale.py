#!/usr/bin/env python
"""End-to-end correctness at north-star scale, on the REAL TPU.

Phase A (default): n = 2^16, 8 towers of ~59/60-bit moduli — encrypt ->
EvalMult+Relin -> rescale -> EvalRotate(1) -> decrypt, with an ASSERTED
error bound and recorded wall times (rotation keys via keygen_batch).
Phase B (E2E_BOOTSTRAP=1): CKKS bootstrap at n = 2^14 with published
timing and an asserted error bound — the contract of
``utckksrns/UnitTestBootstrap.cpp`` at realistic dimensions.

Writes one JSON line per phase to E2E_SCALE.json (appended) and a human
log to stderr. Run: `python e2e_scale.py` (TPU via the axon tunnel;
never concurrently with bench.py).

Env knobs: E2E_RING_LOG (16), E2E_TOWERS (8), E2E_BOOTSTRAP=1,
E2E_SKIP_MULT=1 (bootstrap only).
"""

import json
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

    from openfhe_tpu.models import ckks

    dev = jax.devices()[0]
    results = []

    if os.environ.get("E2E_SKIP_MULT") != "1":
        ring_log = int(os.environ.get("E2E_RING_LOG", "16"))
        towers = int(os.environ.get("E2E_TOWERS", "8"))
        n = 1 << ring_log
        rng = np.random.default_rng(7)
        log(f"[A] device={dev.device_kind} n=2^{ring_log} towers={towers}")

        t0 = time.time()
        params = ckks.CKKSParams(ring_dim=n, mult_depth=towers - 1,
                                 scaling_mod_size=59, first_mod_size=60,
                                 dnum=3)
        ctx = ckks.gen_context(params)
        pk, sk = ckks.keygen(ctx, rng)
        evk = ckks.relin_keygen(ctx, sk, rng)
        t_keygen = time.time() - t0
        log(f"[A] context+keygen+relin: {t_keygen:.1f}s")

        t0 = time.time()
        rot_keys = ckks.rot_keygen(ctx, sk, [1, 2], rng)  # keygen_batch
        t_rotkeys = time.time() - t0
        log(f"[A] 2 rotation keys (batched): {t_rotkeys:.1f}s")

        v1 = rng.uniform(-1, 1, size=n // 2)
        v2 = rng.uniform(-1, 1, size=n // 2)
        t0 = time.time()
        ct1 = ckks.encrypt(ctx, pk, v1, rng)
        ct2 = ckks.encrypt(ctx, pk, v2, rng)
        t_enc = time.time() - t0

        t0 = time.time()
        prod = ckks.rescale(ckks.eval_mult_relin(ct1, ct2, evk))
        np.asarray(prod.polys[0].data.lo[0, 0])  # force
        t_mult = time.time() - t0
        t0 = time.time()
        rot = ckks.eval_rotate(prod, 1, rot_keys[1])
        np.asarray(rot.polys[0].data.lo[0, 0])
        t_rot = time.time() - t0
        log(f"[A] encrypt x2 {t_enc:.1f}s, mult+relin+rescale "
            f"{t_mult:.1f}s (incl. compile), rotate {t_rot:.1f}s")

        t0 = time.time()
        out = ckks.decrypt(ctx, sk, rot, num_slots=n // 2)
        t_dec = time.time() - t0
        want = np.roll(v1 * v2, -1)
        err = float(np.max(np.abs(out.real - want)))
        log(f"[A] decrypt {t_dec:.1f}s, max |err| = {err:.3e}")
        assert err < 1e-4, f"error bound violated: {err}"
        results.append({
            "phase": "mult_rotate", "n": n, "towers": towers,
            "device": dev.device_kind, "max_abs_err": err,
            "bound": 1e-4, "keygen_s": round(t_keygen, 1),
            "rot_keys_batched_s": round(t_rotkeys, 1),
            "encrypt2_s": round(t_enc, 1),
            "mult_relin_rescale_first_s": round(t_mult, 1),
            "rotate_first_s": round(t_rot, 1),
            "decrypt_s": round(t_dec, 1),
        })

    if os.environ.get("E2E_BOOTSTRAP") == "1":
        from openfhe_tpu.models import ckks_bootstrap as boot

        n = 1 << int(os.environ.get("E2E_BOOT_RING_LOG", "14"))
        rng = np.random.default_rng(11)
        log(f"[B] bootstrap at n={n}")
        t0 = time.time()
        # Round 5: the sparse-packing partial-sums fold after ModRaise
        # (ckks_bootstrap.partial_sums_fold) projects away the off-subring
        # overflow components, so the slot readings see only the I values
        # at the 2s subring positions (max ~ 4*sqrt(2 ln 2s) ~ 8 at
        # hw=64) — K=16 covers at ANY ring dimension.
        params = ckks.CKKSParams(ring_dim=n, mult_depth=20,
                                 scaling_mod_size=45, first_mod_size=55,
                                 dnum=3, secret_hw=64)
        ctx = ckks.gen_context(params)
        pk, sk = ckks.keygen(ctx, rng)
        pre = boot.setup(ctx, slots=4, K=16, r=5, cheb_deg=28)
        t_setup = time.time() - t0
        log(f"[B] context+keygen+setup: {t_setup:.1f}s")
        t0 = time.time()
        keys = boot.keygen(ctx, sk, pre, rng)
        t_btkeys = time.time() - t0
        log(f"[B] bootstrap keygen: {t_btkeys:.1f}s")

        vals = np.array([0.25, -0.5, 0.75, 0.125])
        v_rep = np.tile(vals, ctx.params.num_slots // 4)
        ct = ckks.encrypt(ctx, pk, v_rep, rng)
        ct_low = ckks.level_reduce(ct, len(ctx.q_moduli) - 1)
        assert ct_low.towers == 1

        t0 = time.time()
        out = boot.eval_bootstrap(ctx, keys, pre, ct_low)
        np.asarray(out.polys[0].data.lo[0, 0])
        t_first = time.time() - t0
        log(f"[B] bootstrap compile+first: {t_first:.1f}s")
        t0 = time.time()
        out = boot.eval_bootstrap(ctx, keys, pre, ct_low)
        np.asarray(out.polys[0].data.lo[0, 0])
        t_warm = time.time() - t0
        dec = ckks.decrypt(ctx, sk, out, num_slots=4)
        err = float(np.max(np.abs(dec.real - vals)))
        log(f"[B] bootstrap warm: {t_warm:.2f}s, levels regained: "
            f"{out.towers}, max |err| = {err:.3e}")
        assert out.towers > 3
        assert err < 5e-2, f"bootstrap error bound violated: {err}"
        results.append({
            "phase": "bootstrap", "n": n, "device": dev.device_kind,
            "max_abs_err": err, "bound": 5e-2,
            "towers_regained": out.towers,
            "setup_s": round(t_setup, 1),
            "bt_keygen_s": round(t_btkeys, 1),
            "first_s": round(t_first, 1), "warm_s": round(t_warm, 2),
        })

    with open("E2E_SCALE.json", "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
