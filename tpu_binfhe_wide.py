#!/usr/bin/env python
"""Gate-verify the remaining wide BINFHE sets on the real TPU.

Round-4 state: of the six wide (Q >= 2^31) named sets, only STD192 and
STD128Q_3 had run gates to completion. This script runs the AND/OR
truth tables (one batched blind rotation per gate, all four input pairs
at once) for the other four: STD192Q, STD192Q_3, STD192Q_4, STD128Q_4.
Results are recorded in E2E_SCALE.md's BINFHE section and in the
``tests/test_binfhe_wide.py`` docstring.

Run: ``python tpu_binfhe_wide.py`` (TPU via the axon tunnel; never
concurrently with bench.py). Env: WIDE_SETS to override the list.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    os.makedirs("/tmp/openfhe_tpu_xla_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/openfhe_tpu_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openfhe_tpu.models import binfhe

    sets = os.environ.get(
        "WIDE_SETS", "STD192Q,STD192Q_3,STD192Q_4,STD128Q_4").split(",")
    dev = jax.devices()[0]
    results = []
    for name in sets:
        t0 = time.time()
        ctx = binfhe.gen_context(name)
        rng = np.random.default_rng(5)
        sk = binfhe.keygen(ctx, rng)
        bk = binfhe.bootstrap_keygen(ctx, sk, rng)
        t_key = time.time() - t0
        print(f"[{name}] n={ctx.params.n_lwe} N={ctx.params.N} "
              f"Q={ctx.params.Q.bit_length()}b keygen {t_key:.1f}s",
              file=sys.stderr, flush=True)
        pairs = [(0, 0), (0, 1), (1, 0), (1, 1)]
        c1 = [binfhe.encrypt(ctx, sk, x, rng) for x, _ in pairs]
        c2 = [binfhe.encrypt(ctx, sk, y, rng) for _, y in pairs]
        t0 = time.time()
        out_and = [binfhe.decrypt(ctx, sk, o) for o in
                   binfhe.eval_gate_batch(ctx, "AND", bk, c1, c2)]
        out_or = [binfhe.decrypt(ctx, sk, o) for o in
                  binfhe.eval_gate_batch(ctx, "OR", bk, c1, c2)]
        t_gates = time.time() - t0
        ok = out_and == [0, 0, 0, 1] and out_or == [0, 1, 1, 1]
        rec = {"set": name, "device": dev.device_kind, "and": out_and,
               "or": out_or, "ok": ok, "keygen_s": round(t_key, 1),
               "gates_s": round(t_gates, 1)}
        print(json.dumps(rec), flush=True)
        results.append(rec)
        assert ok, rec
    print(f"ALL {len(results)} WIDE SETS GATE-VERIFIED", flush=True)


if __name__ == "__main__":
    main()
