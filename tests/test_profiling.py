"""Timing/profiling utilities (role of debug.h:94-130 TIC/TOC/PROFILELOG
and the jax.profiler trace harness)."""

import io

import jax.numpy as jnp
import numpy as np

from openfhe_tpu.utils import profiling as prof


def test_tic_toc():
    t = prof.TIC()
    assert prof.TOC(t) >= 0.0


def test_timed_blocks_on_device_values():
    with prof.timed("matmul") as r:
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        r.block_on(x)
    assert r.seconds > 0.0
    assert float(np.asarray(x)[0, 0]) == 64.0


def test_op_timer_report():
    t = prof.OpTimer()
    for _ in range(3):
        with t.op("add") as r:
            r.block_on(jnp.ones(8) + 1)
    with t.op("mul") as r:
        r.block_on(jnp.ones(8) * 2)
    assert t.counts == {"add": 3, "mul": 1}
    buf = io.StringIO()
    t.report(file=buf)
    out = buf.getvalue()
    assert "add" in out and "mul" in out and "ms/call" in out


def test_profile_log_switch(capsys):
    prof.set_profile(True)
    try:
        prof.profile_log("unit", 0.001)
    finally:
        prof.set_profile(False)
    assert "unit: 1.000 ms" in capsys.readouterr().err
