"""Persistent XLA compilation cache.

The full physics step is a large program; first compilation at big capacities
is expensive (minutes). Enabling the persistent cache makes every subsequent
process start instantly for already-seen (shapes, config) combinations.
"""

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable(path: str | None = None) -> str:
    path = os.path.abspath(path or os.environ.get("AVIAN_TPU_CACHE", _DEFAULT))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
