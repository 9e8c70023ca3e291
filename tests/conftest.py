"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
and multi-chip code paths are exercised without TPU hardware.

NOTE on this machine: a sitecustomize registers a remote-TPU ("axon") PJRT
plugin and pins `jax_platforms=axon` via jax.config — env vars alone cannot
override it once the interpreter is up.  `jax.config.update` *after* import
wins, so we do that here before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent XLA compile cache for the suite: hundreds of tiny executables
# recompile identically across tests and subprocess children (CLI runs,
# dryruns); a warm stable cache cuts full-suite wall time substantially
# (measured r3: mini run_all 78s -> 23s, reports bit-identical).  The env
# var propagates to subprocess tests whose CLI bootstrap reads it.
# Opt out with AUTOGNOTHI_COMPILE_CACHE=0.
os.environ.setdefault("AUTOGNOTHI_COMPILE_CACHE",
                      "/tmp/autognothi_test_xla_cache")

from autognothi_tpu.utils.devices import maybe_enable_compile_cache  # noqa: E402

maybe_enable_compile_cache()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")
