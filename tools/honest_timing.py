"""Honest wall-clock arbitration between two contradictory measurements.

bench.py (block_until_ready protocol) says the 10k pile runs 0.304
ms/step; tools/profile_stages.py (forced-D2H slope protocol, degraded
dispatch mode) says 590 ms/step. This experiment decides which is real:

- AOT-compile a jitted K-step `lax.scan` of the full physics step
  (compile happens via .lower().compile(), no execution, no D2H).
- Execute it ONCE and immediately read one scalar back. The process has
  never done a D2H before, so dispatch is in fast mode; the single
  trailing D2H must wait for the program to finish, so
  t(dispatch->read) = true device execution time + small constant.
- Run with K from the environment; compare K=10 vs K=100 across two
  process invocations to cancel the constant.

Usage: HONEST_K=100 python tools/honest_timing.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avian_tpu.utils.cache import enable as enable_cache

enable_cache()

import jax

from avian_tpu import PhysicsConfig
from avian_tpu.core.types import ShapeType
from avian_tpu.pipeline.step import physics_step
from avian_tpu.scenes import cube_pile

N = int(os.environ.get("BENCH_CUBES", "10000"))
K = int(os.environ.get("HONEST_K", "100"))

config = PhysicsConfig(
    substeps=4,
    shape_pairs=(
        (ShapeType.BOX, ShapeType.BOX),
        (ShapeType.BOX, ShapeType.PLANE),
    ),
)


def main():
    world, _ = cube_pile(n_cubes=N, max_contacts=8 * N)

    @jax.jit
    def scan_steps(w):
        return jax.lax.scan(
            lambda w, _: (physics_step(w, config), None), w, None, length=K
        )[0]

    # Settle the pile first so we measure the contact-rich steady state:
    # one jitted 60-step scan (AOT-compiled, executed once, NOT timed).
    @jax.jit
    def settle(w):
        return jax.lax.scan(
            lambda w, _: (physics_step(w, config), None), w, None, length=60
        )[0]

    t0 = time.perf_counter()
    settled_c = settle.lower(world).compile()
    main_c = scan_steps.lower(world).compile()
    print(f"compile done in {time.perf_counter() - t0:.1f}s", flush=True)

    world = settled_c(world)

    # The timed region: dispatch the K-step program, then the process's
    # FIRST EVER device->host read. Fast-dispatch mode throughout; the
    # read blocks until the scan (and the settle program before it, which
    # its input depends on) completes.
    t0 = time.perf_counter()
    world = main_c(world)
    x = float(world.bodies.pos[0, 0])  # first D2H in this process
    t1 = time.perf_counter()

    print(
        f"K={K} N={N} total={t1 - t0:.3f}s  per_step={1e3 * (t1 - t0) / K:.3f} ms"
        f"  (includes the 60-step settle + constant; x={x:.4f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
