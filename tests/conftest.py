"""Test configuration: run all tests on a virtual 8-device CPU mesh so
multi-chip sharding paths execute without TPU hardware.

NOTE: the environment may pre-set JAX_PLATFORMS (e.g. to the 'axon' TPU
plugin), so these must be hard overrides, not setdefault — otherwise the
suite silently runs against the real TPU.
"""
import os

# opt-out for the on-chip test files (tests/test_pallas_onchip.py):
# LIFTREG_ONCHIP_TESTS=1 keeps the ambient (TPU) platform
if os.environ.get("LIFTREG_ONCHIP_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported (pytest plugins), in which case the env var
# was captured too early — update the live config as well.
import jax  # noqa: E402

if os.environ.get("LIFTREG_ONCHIP_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
