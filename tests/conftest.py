import os

# Force the CPU backend with 8 virtual devices so sharding paths are
# exercised without TPU hardware; kernels are bit-exact so CPU == TPU.
#
# The environment bakes in a remote-TPU PJRT plugin (sitecustomize imports
# jax at interpreter start and pins JAX_PLATFORMS=axon), so setting env vars
# here is too late — jax.config snapshotted them. Backend *initialization*
# is lazy, so updating the config before the first jax op still works.
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: keyswitch/NTT graphs are large; re-runs hit cache.
os.makedirs("/tmp/openfhe_tpu_xla_cache_cpu", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/openfhe_tpu_xla_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
