"""Diagnostics: per-stage timers and per-step counters.

Counterpart of the reference's ``src/diagnostics/`` (``PhysicsDiagnostics``
trait, solver stage timers, entity counters). On TPU, in-step timers would
break fusion, so there are two tiers:

- ``step_counters``: device-computed scalars from the step
  (``physics_step(..., return_diagnostics=True)`` provides these).
- ``StageTimer``: host-side wall timing with ``block_until_ready`` around
  separately-jitted stages — for profiling sessions, not production loops.
- ``trace``: the JAX profiler for kernel-level inspection.
"""

import contextlib
import time

import jax


class StageTimer:
    """Accumulates wall time per named stage (host-side, syncs the device)."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def stage(self, name, result_ref=None):
        t0 = time.perf_counter()
        yield
        if result_ref is not None:
            jax.block_until_ready(result_ref)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self):
        return {
            k: {"total_s": v, "mean_ms": 1000.0 * v / max(self.counts[k], 1)}
            for k, v in sorted(self.totals.items())
        }


@contextlib.contextmanager
def trace(log_dir="/tmp/avian_tpu_trace"):
    """JAX profiler trace (view in TensorBoard / Perfetto)."""
    with jax.profiler.trace(log_dir):
        yield


def counters_to_host(diag: dict) -> dict:
    """Fetch the device scalar diagnostics dict to Python numbers."""
    return {k: float(v) for k, v in diag.items()}
