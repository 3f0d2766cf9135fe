"""Test config: force an 8-device virtual CPU mesh so sharding/collective
tests run without TPU hardware (and unit tests don't contend for the chip).
"""
import os

# force (not setdefault): the host profile may preset JAX_PLATFORMS to the
# TPU platform, and tests must be deterministic on the virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
