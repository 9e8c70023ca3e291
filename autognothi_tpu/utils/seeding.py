"""Deterministic, resumable RNG derivation.

The reference derives a fresh 32-bit seed per (master seed, stage key) via
sha256 so interrupted runs re-derive identical randomness on resume
(/root/reference/utils/tools.py:46-54).  The JAX analogue maps the same
(master, key) hash onto a `jax.random` key, plus numpy seeding for host-side
shuffles (dataset subsetting).
"""

from __future__ import annotations

import hashlib
import random
from typing import NoReturn, Optional, TypeVar

import numpy as np

T = TypeVar("T")

__all__ = [
    "derive_seed",
    "iterative_key",
    "set_iterative_seed",
    "not_null",
    "guard_never",
]


def derive_seed(master_seed: int, key: str) -> int:
    """sha256-keyed 32-bit seed, identical derivation to the reference."""
    tag = f"[seed={master_seed},key={key}]"
    digest = hashlib.sha256(tag.encode("utf-8", "ignore")).digest()
    return int.from_bytes(digest[:8], byteorder="big") % 2**32


def iterative_key(master_seed: int, key: str):
    """Derive a `jax.random` PRNG key for a named stage/epoch."""
    import jax

    return jax.random.PRNGKey(derive_seed(master_seed, key))


def set_iterative_seed(master_seed: int, key: str) -> int:
    """Seed host-side RNGs (python `random`, numpy) for a named stage.

    Device randomness should instead flow through `iterative_key`; this is
    for host-side choices like dataset subsetting and shuffling.
    """
    seed = derive_seed(master_seed, key)
    random.seed(seed)
    np.random.seed(seed)
    return seed


def not_null(x: Optional[T]) -> T:
    if x is None:
        raise RuntimeError("unexpected null")
    return x


def guard_never(x) -> NoReturn:
    raise RuntimeError(f"unexpected branch: {x!r}")
