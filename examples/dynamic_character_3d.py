"""Dynamic character 3D (reference `dynamic_character_3d/`): a rigid-body
capsule with locked rotations, driven by writing its horizontal velocity
each control tick. Gravity, the step, and the wall are all handled by the
normal contact solver — no kinematic controller involved."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.core import types as t


def main():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0), friction=0.2)
    step_b = b.add_body(body_type=BodyType.STATIC, pos=(2.5, 0.1, 0.0))
    b.box(step_b, 0.8, 0.1, 3.0)  # a 0.2 m step
    wall = b.add_body(body_type=BodyType.STATIC, pos=(6.0, 1.5, 0.0))
    b.box(wall, 0.3, 3.0, 8.0)
    hero = b.add_body(
        pos=(0.0, 0.91, 0.0),
        locked_axes=t.LOCK_RX | t.LOCK_RY | t.LOCK_RZ,
        sleep_disabled=True,
    )
    b.capsule(hero, 0.4, 1.0, friction=0.2)
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=32)

    cfg = PhysicsConfig(max_colors=4)

    # Drive the horizontal velocity EVERY tick (the reference applies its
    # movement input each fixed update), keeping the solver-owned vy.
    from avian_tpu.pipeline.step import physics_step

    def drive(w, _):
        lv = w.bodies.lin_vel.at[hero, 0].set(2.0)
        lv = lv.at[hero, 2].set(0.0)
        w = w.replace(bodies=w.bodies.replace(lin_vel=lv))
        return physics_step(w, cfg), None

    world = jax.jit(
        lambda w: jax.lax.scan(drive, w, None, length=180)[0]
    )(world)

    p = np.asarray(world.bodies.pos[hero])
    q = np.asarray(world.bodies.quat[hero])
    assert np.isfinite(p).all()
    # Walked forward over the step and was stopped by the wall face
    # (wall at x=5.7, capsule radius 0.4 -> center <= ~5.3).
    assert p[0] > 3.5, f"did not walk over the step: {p}"
    assert p[0] < 5.45, f"went through the wall: {p}"
    # Rotation locks held: the capsule never tipped.
    assert abs(q[0]) < 1e-3 and abs(q[2]) < 1e-3, f"tipped: {q}"
    print(f"dynamic_character_3d: stopped at x={p[0]:.2f} (wall face 5.3), upright")


if __name__ == "__main__":
    main()
