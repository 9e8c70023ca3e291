"""Native (C++) runtime components, loaded through ctypes.

Built on first use with the system toolchain and cached next to the source;
every native component has a pure-Python reference implementation that the
call sites fall back to when the toolchain or ABI is unavailable."""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional

_HERE = pathlib.Path(__file__).parent


def build_and_load(stem: str) -> Optional[ctypes.CDLL]:
    """Compile `<stem>.cpp` into `<stem>.so` (if stale) and dlopen it.
    Returns None when compilation isn't possible."""
    src = _HERE / f"{stem}.cpp"
    lib = _HERE / f"{stem}.so"
    try:
        if not lib.exists() or lib.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 str(src), "-o", str(lib)],
                check=True, capture_output=True,
            )
        return ctypes.CDLL(str(lib))
    except Exception:
        return None
