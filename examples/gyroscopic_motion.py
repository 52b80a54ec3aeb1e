"""Dzhanibekov effect: a body spinning about its unstable intermediate
principal axis periodically flips (reference
``crates/avian3d/examples/gyroscopic_motion.rs``; gyroscopic integration
``src/dynamics/integrator/mod.rs:403-456``).

A T-handle-like inertia (I_x < I_y < I_z) spun about Y with a tiny
perturbation must tumble — the spin axis leaves Y — while conserving
angular momentum magnitude (the integrator clamps drift).

Run: python examples/gyroscopic_motion.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.pipeline.step import rollout


def main():
    b = SceneBuilder()
    b.gravity = (0.0, 0.0, 0.0)
    # Distinct principal moments via an elongated box; spin about the
    # intermediate axis + small perturbation.
    body = b.add_body(
        pos=(0, 0, 0), ang_vel=(0.02, 6.0, 0.0), gyroscopic=True,
    )
    b.box(body, 0.5, 0.25, 0.1)  # hx > hy > hz -> I_y intermediate
    world = b.finalize(max_bodies=2, max_colliders=2, max_contacts=8)

    config = PhysicsConfig()
    roll = jax.jit(lambda w: rollout(w, config, 60))

    w0 = np.asarray(world.bodies.ang_vel[body])
    min_wy = 1e9
    for _ in range(8):
        world = roll(world)
        wy = float(world.bodies.ang_vel[body][1])
        min_wy = min(min_wy, wy)
    w_end = np.asarray(world.bodies.ang_vel[body])
    assert np.isfinite(w_end).all()
    # The flip: spin about Y reverses (Dzhanibekov) at some point.
    assert min_wy < -1.0, f"no flip observed (min w_y = {min_wy:.2f})"
    # Energy bounded (gyroscopic clamping): |w| must not blow up.
    assert np.linalg.norm(w_end) < 2.0 * np.linalg.norm(w0)
    print(f"gyroscopic OK: intermediate-axis flip observed "
          f"(min w_y = {min_wy:.2f}), |w| {np.linalg.norm(w0):.2f} -> "
          f"{np.linalg.norm(w_end):.2f} rad/s")


if __name__ == "__main__":
    main()
