import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware; kernels are bit-exact so CPU results equal TPU.
# NOTE: must overwrite (not setdefault) — the environment pins JAX_PLATFORMS
# to the remote-TPU plugin, which would route every test op over a
# high-latency tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
