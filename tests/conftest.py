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
    # Strip the TPU-plugin site dir from the env so SUBPROCESSES spawned by
    # tests (preprocessing/DRR/e2e CLIs) can't load it. The plugin ships a
    # sitecustomize.py that registers itself at every interpreter start, and
    # with the device tunnel dead that registration makes jax hang at
    # backend init — the JAX_PLATFORMS=cpu env var alone does NOT prevent
    # it (measured; only jax.config.update after import, or an absent
    # plugin, does). Path-component match, not substring.
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from liftreg_tpu.envpath import (pythonpath_without_plugin,
                                     strip_plugin_paths)
    if "PYTHONPATH" in os.environ:
        os.environ["PYTHONPATH"] = pythonpath_without_plugin()
    sys.path[:] = strip_plugin_paths(sys.path)
    # (in THIS process the load-bearing line is the jax.config.update
    # below — sitecustomize already ran before conftest was imported)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported (pytest plugins), in which case the env var
# was captured too early — update the live config as well.
import jax  # noqa: E402

if os.environ.get("LIFTREG_ONCHIP_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
    # The fast suite is compile-dominated on the 1-core CPU (the top
    # offenders are 10-30 s compiles of tiny programs). A persistent
    # compilation cache makes repeat invocations cheap. This cache is
    # CPU-only and kept SEPARATE from the TPU-host .jax_cache at the repo
    # root (mixing backends in one dir risks AOT machine-feature
    # mismatches — see tools/bench_refine.py).
    _cache = os.path.join(os.path.dirname(__file__), ".jax_cache_cpu")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
