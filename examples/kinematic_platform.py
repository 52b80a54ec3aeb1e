"""Kinematic bodies (reference kinematic character/platform examples): a
velocity-driven kinematic elevator carries a dynamic box upward; kinematic
bodies are immune to impulses but push dynamic ones."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step


def main():
    b = SceneBuilder()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0, 1, 0))
    lift = b.add_body(body_type=BodyType.KINEMATIC, pos=(0, 0.1, 0))
    b.box(lift, 1.0, 0.1, 1.0, friction=0.9)
    box = b.add_body(pos=(0, 0.7, 0))
    b.box(box, 0.3, 0.3, 0.3, friction=0.9)
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    config = PhysicsConfig(max_colors=4)

    # Drive the lift up at 1 m/s by setting its velocity (kinematic bodies
    # integrate velocities but ignore forces and impulses).
    world = world.replace(
        bodies=world.bodies.replace(
            lin_vel=world.bodies.lin_vel.at[lift].set(
                jnp.asarray([0.0, 1.0, 0.0])
            )
        )
    )
    for _ in range(120):
        world = physics_step(world, config)
        # Keep the drive velocity (contacts never change a kinematic body,
        # but we re-assert the script each frame like a game would).
        world = world.replace(
            bodies=world.bodies.replace(
                lin_vel=world.bodies.lin_vel.at[lift].set(
                    jnp.asarray([0.0, 1.0, 0.0])
                )
            )
        )

    lift_y = float(world.bodies.pos[lift][1])
    box_y = float(world.bodies.pos[box][1])
    assert abs(lift_y - 2.1) < 0.05, f"lift should be at ~2.1: {lift_y}"
    # The box rode the lift: its base sits on the platform top.
    assert abs(box_y - (lift_y + 0.1 + 0.3)) < 0.1, (
        f"box should ride the lift: box {box_y} lift {lift_y}"
    )
    print(f"kinematic platform at y={lift_y:.2f} carried box to y={box_y:.2f}")


if __name__ == "__main__":
    main()
