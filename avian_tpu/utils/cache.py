"""Persistent XLA compilation cache.

The full physics step is a large program; first compilation at big capacities
is expensive (minutes). Enabling the persistent cache makes every subsequent
process start instantly for already-seen (shapes, config) combinations.
"""

import hashlib
import os

import jax

_DEFAULT = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def _host_key() -> str:
    """Key the cache by host CPU features: XLA:CPU stores AOT machine code,
    and entries compiled on a different microarchitecture can SIGILL/abort
    when loaded (the workspace — and so the cache dir — can persist across
    machines)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def enable(path: str | None = None) -> str:
    path = os.path.abspath(path or os.environ.get("AVIAN_TPU_CACHE", _DEFAULT))
    path = os.path.join(path, _host_key())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
