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


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")
