"""Kinematic character 2D (reference `kinematic_character_2d/` /
`move_and_slide_2d.rs`): the move-and-slide controller constrained to
the XY plane — walks over a step and is stopped by a wall, with no
dynamic body involved."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, ShapeType
from avian_tpu.character import move_and_slide
from avian_tpu.pipeline.broadphase import update_aabbs

CFG = PhysicsConfig()
ID = (0.0, 0.0, 0.0, 1.0)


def main():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    step_b = b.add_body(body_type=BodyType.STATIC, pos=(2.5, 0.1, 0.0))
    b.box(step_b, 0.8, 0.1, 1.0)
    wall = b.add_body(body_type=BodyType.STATIC, pos=(5.0, 1.5, 0.0))
    b.box(wall, 0.3, 3.0, 4.0)
    world = update_aabbs(
        b.finalize(max_bodies=4, max_colliders=4, max_contacts=16), CFG
    )

    mas = jax.jit(move_and_slide, static_argnames=("shape_type", "config"))
    pos = np.asarray([0.0, 0.91, 0.0], np.float32)
    dt = 1.0 / 30.0
    for _ in range(75):  # 2.5 s of walking toward +x
        vel = np.asarray([2.0, -1.0, 0.0], np.float32)
        pos, vel, normal = mas(
            world, ShapeType.CAPSULE, (0.5, 0.4), pos, ID, vel, dt
        )
        pos = np.array(pos)
        pos[2] = 0.0  # plane constraint: the 2D profile of the controller

    assert np.isfinite(pos).all()
    assert abs(pos[2]) < 1e-6
    # Climbed the step and stopped at the wall face (x = 4.7 - 0.4).
    assert pos[0] > 3.2, f"did not walk: {pos}"
    assert pos[0] < 4.45, f"went through the wall: {pos}"
    assert pos[1] > 0.8, f"sank through the floor: {pos}"
    print(f"kinematic_character_2d: stopped at x={pos[0]:.2f}, y={pos[1]:.2f}")


if __name__ == "__main__":
    main()
