"""Timing and profiling utilities.

Role of the reference's TIC/TOC + ``PROFILELOG`` macros
(``utils/debug.h:94-130``) and its google-benchmark harness, rebuilt for
the XLA execution model: because dispatch is asynchronous, naive
wall-clock timing measures enqueue rate, not device time — ``timed``
blocks until results are ready, and ``trace`` wraps ``jax.profiler`` for
per-kernel breakdowns viewable in TensorBoard/Perfetto.

Usage::

    from openfhe_tpu.utils.profiling import TIC, TOC, timed, trace, profile_log

    t = TIC()
    ...
    print(TOC(t))                      # wall seconds

    with timed("mult_relin") as r:     # blocks on device results
        out = ckks.eval_mult_relin(ct, ct, evk)
        r.block_on(out)
    # r.seconds, plus a PROFILELOG-style line on stderr when enabled

    with trace("/tmp/fhe_trace"):      # jax.profiler trace directory
        run_workload()
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

import jax

# PROFILELOG is compiled in when the reference defines PROFILE; here it is
# a runtime switch (env OPENFHE_TPU_PROFILE=1 or set_profile(True)).
_PROFILE = os.environ.get("OPENFHE_TPU_PROFILE", "0") == "1"


def set_profile(on: bool) -> None:
    global _PROFILE
    _PROFILE = on


def profile_log(label: str, seconds: float) -> None:
    """(role of PROFILELOG, debug.h:124-130)."""
    if _PROFILE:
        print(f"[openfhe_tpu] {label}: {seconds * 1e3:.3f} ms",
              file=sys.stderr)


def TIC() -> float:
    """(role of the TIC macro, debug.h:94)."""
    return time.perf_counter()


def TOC(t: float) -> float:
    """(role of the TOC macro): seconds since TIC."""
    return time.perf_counter() - t


def _block(x) -> None:
    """Block until every array in the pytree has materialized. NOTE: on
    the remote-TPU tunnel block_until_ready may not block through the
    transfer layer — force a tiny readback per leaf (the honest-bench
    lesson from bench.py)."""
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "addressable_shards"):
            import numpy as _np
            _np.asarray(jax.device_get(
                leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf))


class _TimedResult:
    def __init__(self, label: str):
        self.label = label
        self.seconds = 0.0
        self._targets = []

    def block_on(self, x) -> None:
        """Register device values the timer must wait for."""
        self._targets.append(x)


@contextlib.contextmanager
def timed(label: str):
    """Wall-clock a block, blocking on registered device outputs so the
    measurement covers device execution, not just dispatch."""
    r = _TimedResult(label)
    t0 = time.perf_counter()
    try:
        yield r
    finally:
        for x in r._targets:
            _block(x)
        r.seconds = time.perf_counter() - t0
        profile_log(label, r.seconds)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace of the enclosed block (open the directory with
    TensorBoard or ui.perfetto.dev to see the per-kernel timeline)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class OpTimer:
    """Accumulate per-op wall times across a workload; print a breakdown
    (role of the reference's per-benchmark console reporter)."""

    def __init__(self):
        self.totals: dict = {}
        self.counts: dict = {}

    @contextlib.contextmanager
    def op(self, name: str):
        with timed(name) as r:
            yield r
        self.totals[name] = self.totals.get(name, 0.0) + r.seconds
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, file=sys.stderr) -> None:
        width = max((len(k) for k in self.totals), default=4)
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            tot, cnt = self.totals[name], self.counts[name]
            print(f"{name:<{width}}  {tot * 1e3:9.3f} ms total  "
                  f"{cnt:5d} calls  {tot / cnt * 1e3:9.3f} ms/call",
                  file=file)
