"""Persistent XLA compilation cache knob (AUTOGNOTHI_COMPILE_CACHE).

On the deployment this framework targets, a cold executable compile costs
~1-2 min (remote-tunneled chip; CLAUDE.md quirks) — the persistent cache
amortizes that to a disk read across processes.  These tests pin the knob's
contract: env parsing, config effects, and actual cache-entry writes.
"""

from __future__ import annotations

import pathlib

import jax

from autognothi_tpu.utils.devices import maybe_enable_compile_cache


def _snapshot():
    return {
        "dir": jax.config.jax_compilation_cache_dir,
        "secs": jax.config.jax_persistent_cache_min_compile_time_secs,
        "bytes": jax.config.jax_persistent_cache_min_entry_size_bytes,
    }


def _restore(s):
    jax.config.update("jax_compilation_cache_dir", s["dir"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", s["secs"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", s["bytes"])
    # the initialized cache object still points at the test dir; drop it so
    # later suite compiles go back to the restored dir (lazy re-init)
    from jax.experimental.compilation_cache import compilation_cache

    compilation_cache.reset_cache()


def test_unset_is_off(monkeypatch):
    monkeypatch.delenv("AUTOGNOTHI_COMPILE_CACHE", raising=False)
    assert maybe_enable_compile_cache() is None
    monkeypatch.setenv("AUTOGNOTHI_COMPILE_CACHE", "0")
    assert maybe_enable_compile_cache() is None


def test_cache_dir_created_and_populated(monkeypatch, tmp_path):
    snap = _snapshot()
    try:
        cache = tmp_path / "xla_cache"
        monkeypatch.setenv("AUTOGNOTHI_COMPILE_CACHE", str(cache))
        # the active dir is scoped by a host-CPU fingerprint: XLA:CPU AOT
        # entries embed the compiling host's machine features, and loading
        # one on a host without them hard-aborts (observed r5 after a VM
        # host migration) — each machine type keeps its own entries
        used = maybe_enable_compile_cache()
        assert used.startswith(str(cache) + "/host-"), used
        cache = pathlib.Path(used)
        assert cache.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(cache)

        import jax.numpy as jnp

        # a shape unlikely to collide with any other test's executables
        x = jnp.arange(173.0).reshape(1, 173)

        @jax.jit
        def fn(v):
            return (v * 3.0 + 1.0).sum()

        fn(x).block_until_ready()
        entries = list(cache.iterdir())
        assert entries, "compile produced no persistent cache entry"
    finally:
        _restore(snap)
