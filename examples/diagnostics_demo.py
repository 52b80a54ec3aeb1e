"""Per-stage timers + device counters (the reference's diagnostics.rs
example / PhysicsDiagnosticsPlugin)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from avian_tpu import PhysicsConfig, physics_step
from avian_tpu.scenes import cube_pile
from avian_tpu.utils.diagnostics import StageTimer, counters_to_host


def main():
    world, _ = cube_pile(n_cubes=27)
    cfg = PhysicsConfig()  # default 12 colors: a 3x3x3 pile needs them
    step = jax.jit(
        lambda w: physics_step(w, cfg, return_diagnostics=True)
    )

    timers = StageTimer()
    for _ in range(30):
        with timers.stage("step"):
            world, diag = step(world)
            jax.block_until_ready(world.bodies.pos)
    host = counters_to_host(diag)
    print("stage timers:", timers.report())
    print("device counters:", {k: host[k] for k in sorted(host)})
    assert host["num_touching"] > 0
    assert host["dropped_pairs"] == 0 and host["overflow_dropped"] == 0
    assert not host["diverged"]
    print("diagnostics OK")


if __name__ == "__main__":
    main()
