"""Device helpers: host-CPU placement for surgery-heavy phases.

Weight conversion runs hundreds of tiny ops (per-leaf inits, clones,
merges).  On a remote-tunneled accelerator each op is a network round trip,
turning a sub-second phase into minutes — so conversions run on the host CPU
backend and trainers move the finished params to the accelerator in one
transfer.  `ensure_cpu_backend()` widens `jax_platforms` so the CPU backend
coexists with the accelerator."""

from __future__ import annotations

import contextlib
import os
import pathlib
from typing import Iterator, Optional

import jax


def _host_fingerprint() -> str:
    """Short digest of the host CPU's ISA feature set (+ arch), used to
    scope the persistent compile cache per machine type."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    # sorted: flag ORDER varies across kernels, features
                    # don't
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:  # pragma: no cover - non-Linux
        pass
    digest = hashlib.sha256(
        f"{platform.machine()}|{flags}".encode()).hexdigest()[:12]
    return f"host-{digest}"


def maybe_enable_compile_cache() -> Optional[str]:
    """Opt-in persistent XLA compilation cache (AUTOGNOTHI_COMPILE_CACHE).

    On this class of deployment a cold compile of a serving/train executable
    costs ~1-2 min (remote-tunneled chip); the persistent cache amortizes it
    to a disk read across processes and restarts.  Values: a directory path,
    or "1" for the default `~/.cache/autognothi_tpu/xla`.  Unset/empty/0 =
    off (JAX default).  Returns the directory in use, or None.
    """
    val = os.environ.get("AUTOGNOTHI_COMPILE_CACHE", "")
    if not val or val == "0":
        return None
    if val == "1":
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "autognothi_tpu", "xla")
    else:
        cache_dir = os.path.expanduser(val)
    # XLA:CPU AOT cache entries embed the COMPILING host's machine features
    # (avx512/amx/...), and jax's cache key does not: on VMs that migrate
    # between physical hosts, a later process loads an entry compiled for
    # features it doesn't have — "Target machine feature ... is not
    # supported on the host machine" followed by a hard abort mid-epoch
    # (observed r5: SIGABRT in the test suite after a host migration).
    # Scope the directory by a host-CPU fingerprint so each machine type
    # keeps its own entries.
    cache_dir = os.path.join(cache_dir, _host_fingerprint())
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    redirecting = (jax.config.jax_compilation_cache_dir or "") not in (
        "", cache_dir)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    if redirecting:
        # jax initializes the persistent cache object lazily and keeps it;
        # once any compile has touched the old dir, a config update alone is
        # silently ignored — reset so the new dir actually takes effect
        from jax.experimental.compilation_cache import compilation_cache

        compilation_cache.reset_cache()
    # cache every executable: the tunnel's cost floor is per-dispatch, not
    # per-FLOP, so even sub-second compiles are worth persisting
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir


def ensure_cpu_backend() -> None:
    """Make the CPU backend available alongside the configured platform."""
    try:
        current = jax.config.jax_platforms
    except AttributeError:  # pragma: no cover
        return
    if current and "cpu" not in current.split(","):
        try:
            jax.config.update("jax_platforms", current + ",cpu")
        except Exception:  # backends already initialized — leave as-is
            pass


def host_cpu_device() -> Optional[jax.Device]:
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


@contextlib.contextmanager
def on_host() -> Iterator[None]:
    """Run the enclosed jax ops on the host CPU backend when available."""
    cpu = host_cpu_device()
    if cpu is None:
        yield
        return
    with jax.default_device(cpu):
        yield
