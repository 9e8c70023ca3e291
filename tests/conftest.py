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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_timeout_seconds" not in flags:
    # XLA:CPU's collective rendezvous LOG(FATAL)s the whole process when a
    # participant does not arrive within this timeout (default ~30s).  On
    # this 1-core host, 8 virtual devices' threads run heavily
    # oversubscribed, and the pp trainer steps (ppermute + all-reduce mixes)
    # can legitimately keep a participant busy past the default mid-suite —
    # observed as flaky silent SIGABRTs in test_train_pp (r5, BASELINE.md).
    # A true deadlock still aborts eventually — but only after a 20-min
    # stall that timestamps/ps attribute to the stuck test, instead of a
    # 30s window that reads as a random mid-suite death.
    flags = (flags + " --xla_cpu_collective_timeout_seconds=1200").strip()
os.environ["XLA_FLAGS"] = flags

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
