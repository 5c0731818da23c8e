"""Shared timing helpers with the marginal methodology of bench.py.

``jax.block_until_ready`` does NOT block through the remote ``axon`` PJRT
tunnel, so wall-clock around dispatches measures enqueue rate, not device
time (bench.py docstring). Every helper here (a) forces a REAL
device->host readback via np.asarray and (b) reports the MARGINAL cost
between two trip counts, cancelling dispatch + readback round-trips.

Each helper tags its methodology so downstream JSON is self-describing:

* ``marginal_loop_us`` — op runs as a lax.fori_loop inside ONE jit
  (pure device time; needs a structure-preserving body).
* ``marginal_stream_us`` — k eager dispatches chained by data dependence,
  one readback at the end (sustained per-op throughput incl. dispatch;
  for ops whose output structure differs from their input).
* ``oneshot_s`` — wall-clock of a host+device one-shot (keygen, encrypt)
  after a warmup call; inherently synchronous paths only.
"""

import time

import numpy as np

METHOD_LOOP = "fori_loop-marginal"
METHOD_STREAM = "stream-marginal"
METHOD_ONESHOT = "wall-oneshot-warm"


def marginal_loop_us(body, init, probe, k_small=5, k_big=25, reps=3):
    """Marginal us/op of ``body`` (pytree -> same-structure pytree) via
    jitted fori_loops at two trip counts. ``probe(out)`` must return one
    array element to force-read."""
    import jax

    totals = {}
    for k in (k_small, k_big):
        f = jax.jit(lambda x, k=k: jax.lax.fori_loop(
            0, k, lambda i, v: body(v), x))
        np.asarray(probe(f(init)))  # compile + first + readback
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(probe(f(init)))
            ts.append(time.perf_counter() - t0)
        totals[k] = float(np.median(ts))
    return (totals[k_big] - totals[k_small]) / (k_big - k_small) * 1e6


def marginal_stream_us(step, init, probe, k_small=4, k_big=16, reps=3):
    """Marginal us/op of ``step`` (out_prev -> out; any structure) across
    k chained eager dispatches with ONE forced readback at the end."""
    totals = {}
    out = step(init)  # warm/compile
    np.asarray(probe(out))
    for k in (k_small, k_big):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            x = init
            for _ in range(k):
                x = step(x)
            np.asarray(probe(x))
            ts.append(time.perf_counter() - t0)
        totals[k] = float(np.median(ts))
    return (totals[k_big] - totals[k_small]) / (k_big - k_small) * 1e6


def oneshot_s(fn, probe=None):
    """Wall-clock seconds of one call after a warmup call. Use only for
    host-synchronous paths (keygen/encrypt/decrypt do host CRT work and
    numpy conversions that serialize with the device)."""
    out = fn()
    if probe is not None:
        np.asarray(probe(out))
    t0 = time.perf_counter()
    out = fn()
    if probe is not None:
        np.asarray(probe(out))
    return time.perf_counter() - t0
