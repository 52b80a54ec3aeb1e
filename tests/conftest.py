"""Test harness config: run on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os

# Force (not setdefault): the shell may preset JAX_PLATFORMS to the real
# TPU plugin, but tests exercise sharding on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The runtime's sitecustomize may import jax at interpreter start (before
# this file), in which case the env var above is read too late — force the
# platform through the live config as well (works until backend init).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from avian_tpu.utils.cache import enable as _enable_cache  # noqa: E402

_enable_cache()


# Shared narrowphase branch set for test configs: one jit cache entry per
# module regardless of which scene a test builds (worlds carry their own
# static `shape_pairs`, which would otherwise fragment the cache). The
# capsule-box generic branch is excluded — no test scene rests a capsule
# on a box, and its support-patch pipeline is the most expensive compile.
TEST_SHAPE_PAIRS = (
    (0, 0), (0, 1), (0, 2), (0, 3),
    (1, 1), (1, 3),
    (2, 2), (2, 3),
)


# --- persistent-cache write window -----------------------------------------
# XLA:CPU executable serialization segfaults/aborts late in long sessions on
# this runtime (observed only after ~7+ minutes in-process, always inside
# compilation_cache.put_executable_and_time; fresh processes serialize the
# same programs fine). Reads are unaffected. Cap WRITES to the first few
# minutes of a session: each run caches a frontier of programs, so the suite
# converges to fully-warm over a few runs without ever writing late.
import time as _time

_SESSION_T0 = _time.monotonic()
_WRITE_WINDOW_S = 300.0
_writes_disabled = [False]


def pytest_runtest_setup(item):
    if not _writes_disabled[0] and (
        _time.monotonic() - _SESSION_T0 > _WRITE_WINDOW_S
    ):
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1e9
        )
        _writes_disabled[0] = True
