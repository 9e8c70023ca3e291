"""Device helpers: host-CPU placement for surgery-heavy phases.

Weight conversion runs hundreds of tiny ops (per-leaf inits, clones,
merges).  On a remote-tunneled accelerator each op is a network round trip,
turning a sub-second phase into minutes — so conversions run on the host CPU
backend and trainers move the finished params to the accelerator in one
transfer.  `ensure_cpu_backend()` widens `jax_platforms` so the CPU backend
coexists with the accelerator."""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


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
