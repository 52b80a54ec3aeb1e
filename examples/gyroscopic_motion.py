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

    def body_spin_alignment(w):
        # World angular momentum is conserved; the Dzhanibekov flip shows
        # up as the body's local +Y axis reversing against it.
        q = np.asarray(w.bodies.quat[body])
        x, y, z, wq = q
        # Rotate (0,1,0) by q.
        ey = np.asarray([
            2 * (x * y - wq * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z + wq * x),
        ])
        return float(ey[1])  # L is along world Y here

    w0 = np.asarray(world.bodies.ang_vel[body])
    min_align = 1.0
    max_wobble = 0.0
    for _ in range(8):
        world = roll(world)
        min_align = min(min_align, body_spin_alignment(world))
        wv = np.asarray(world.bodies.ang_vel[body])
        max_wobble = max(max_wobble, abs(float(wv[0])), abs(float(wv[2])))
    w_end = np.asarray(world.bodies.ang_vel[body])
    assert np.isfinite(w_end).all()
    # The flip: the body's spin axis reverses against the (conserved)
    # momentum direction at some point during the tumble.
    assert min_align < -0.5, f"no flip observed (min align = {min_align:.2f})"
    assert max_wobble > 0.5, "no intermediate-axis tumble developed"
    # Momentum-magnitude clamping keeps |w| bounded.
    assert np.linalg.norm(w_end) < 2.0 * np.linalg.norm(w0)
    print(f"gyroscopic OK: Dzhanibekov flip (min axis alignment = "
          f"{min_align:.2f}, peak wobble {max_wobble:.2f} rad/s), |w| "
          f"{np.linalg.norm(w0):.2f} -> {np.linalg.norm(w_end):.2f} rad/s")


if __name__ == "__main__":
    main()
