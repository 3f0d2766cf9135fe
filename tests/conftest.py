"""Test config: force an 8-device virtual CPU mesh so sharding/collective
tests run without TPU hardware (and unit tests don't contend for the chip).

The host image pre-imports jax at interpreter startup (sitecustomize), so
assigning JAX_PLATFORMS here is NOT enough — jax's config already captured
the profile's JAX_PLATFORMS=axon. jax.config.update still wins as long as
no backend has initialized, so do both, then hard-verify.
"""
import os

# force (not setdefault): the host profile presets JAX_PLATFORMS to the
# TPU platform, and tests must be deterministic on the virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    f"tests must run on the virtual CPU mesh, got {jax.devices()[0].platform}")
assert jax.device_count() >= 8, (
    f"expected >=8 virtual CPU devices, got {jax.device_count()}")
