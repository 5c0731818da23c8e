"""Shared setup for the example programs: put the repo root on sys.path,
force local CPU execution when no TPU is wanted, enable the persistent
compile cache."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("EXAMPLES_ON_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if os.environ.get("EXAMPLES_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
cache = "/tmp/openfhe_tpu_xla_cache" if os.environ.get("EXAMPLES_ON_TPU") == "1" \
    else "/tmp/openfhe_tpu_xla_cache_cpu"
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
