"""Sensor colliders (reference `sensor.rs`): a sensor region detects
bodies passing through without colliding with them."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step
from avian_tpu.api import collisions


def main():
    b = SceneBuilder()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0, 1, 0))
    gate = b.add_body(body_type=BodyType.STATIC, pos=(0, 2.0, 0))
    b.box(gate, 1.0, 1.0, 1.0, is_sensor=True)   # sensor region
    ball = b.add_body(pos=(0, 5.0, 0))
    b.sphere(ball, 0.4)

    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    config = PhysicsConfig(max_colors=4)

    entered = exited = False
    for _ in range(240):
        world = physics_step(world, config)
        c = world.contacts
        sens = np.asarray(c.active & c.is_sensor)
        if np.asarray(collisions.started(world))[sens].any():
            entered = True
        if entered and (
            np.asarray(collisions.ended(world))[sens].any()
            or np.asarray(collisions.ended_evicted(world)[0]).any()
        ):
            exited = True

    y = float(world.bodies.pos[ball][1])
    assert entered, "ball never entered the sensor"
    assert exited, "ball never exited the sensor"
    assert abs(y - 0.4) < 0.02, f"sensor must not block the fall: y={y}"
    print(f"sensor: entered and exited; ball rests at y={y:.3f}")


if __name__ == "__main__":
    main()
