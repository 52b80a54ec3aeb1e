"""A restitution demo: ball bouncing to rest (reference example: basic
dynamics scenes). Run: python examples/bouncing_ball.py"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step


def main():
    b = SceneBuilder()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0, 1, 0), restitution=0.7)
    ball = b.add_body(pos=(0.0, 4.0, 0.0))
    b.sphere(ball, 0.5, restitution=0.7)
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)

    config = PhysicsConfig()
    for i in range(300):
        world = physics_step(world, config)
        if i % 20 == 0:
            y = float(world.bodies.pos[ball][1])
            print(f"t={float(world.time):5.2f}s  y={y:6.3f}  "
                  f"sleeping={bool(world.bodies.sleeping[ball])}")


if __name__ == "__main__":
    main()
