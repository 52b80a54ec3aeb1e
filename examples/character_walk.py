"""move_and_slide demo: a capsule character walks over a step and along a
wall (reference ``examples/move_and_slide``/kinematic character).

Run: python examples/character_walk.py
"""

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
    step_b = b.add_body(body_type=BodyType.STATIC, pos=(2.5, 0.15, 0.0))
    b.box(step_b, 0.8, 0.15, 3.0)  # a 0.3 m step
    wall = b.add_body(body_type=BodyType.STATIC, pos=(6.0, 1.5, 0.0))
    b.box(wall, 0.3, 3.0, 8.0)
    world = update_aabbs(
        b.finalize(max_bodies=4, max_colliders=4, max_contacts=16), CFG
    )

    mas = jax.jit(move_and_slide, static_argnames=("shape_type", "config"))
    pos = np.asarray([0.0, 0.91, 0.0], np.float32)
    vel = np.asarray([2.0, -1.0, 0.0], np.float32)
    dt = 1.0 / 30.0
    for _ in range(90):  # 3 s of walking toward +x
        pos, vel, normal = mas(
            world, ShapeType.CAPSULE, (0.5, 0.4), pos, ID, vel, dt
        )
        pos = np.array(pos)
        vel = np.array(vel)
        vel[0] = 2.0  # keep walking
        vel[1] = max(vel[1], -1.0) - 0.3  # stick to ground
    assert np.isfinite(pos).all()
    # Walked forward, climbed the step, stopped at the wall face (x=5.7).
    assert pos[0] > 4.0, f"did not walk: x={pos[0]:.2f}"
    assert pos[0] < 5.75 - 0.4 + 0.05, f"penetrated the wall: x={pos[0]:.2f}"
    assert pos[1] > 0.8, f"sunk into the ground: y={pos[1]:.2f}"
    print(f"character OK: walked to x={pos[0]:.2f}, y={pos[1]:.2f}, "
          f"stopped at the wall")


if __name__ == "__main__":
    main()
