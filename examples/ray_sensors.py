"""Persistent ray casters + sensor zones + collision layers in one demo
(the reference's ray_caster.rs / sensor.rs / collision_layers.rs)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step
from avian_tpu.api import collisions
from avian_tpu.queries.accel import RayCasters, update_ray_casters

CFG = PhysicsConfig(max_colors=4)


def main():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    # Sensor zone above the ground.
    zone = b.add_body(body_type=BodyType.STATIC, pos=(0, 1.0, 0))
    b.box(zone, 1.0, 1.0, 1.0, is_sensor=True)
    # Ball on layer 2 falls through a layer-1-only filter zone boundary.
    ball = b.add_body(pos=(0, 4.0, 0))
    b.sphere(ball, 0.4)
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)

    # A downward ray caster attached to the ball.
    casters = RayCasters.create(
        [dict(body=ball, origin=(0, -0.41, 0), direction=(0, -1, 0),
              max_distance=100.0)]
    )

    step = jax.jit(lambda w: physics_step(w, CFG))
    probe = jax.jit(lambda w, c: update_ray_casters(w, c))
    entered = False
    for _ in range(120):
        world = step(world)
        if bool(collisions.started(world).any()):
            entered = True
    hits = probe(world, casters)
    assert entered, "sensor zone never reported a start event"
    assert bool(hits.hit[0])
    dist = float(hits.distance[0])
    assert dist < 0.2, dist  # ball resting: ray hits ground just below
    print(f"ray_sensors OK: sensor start event fired; attached ray caster "
          f"reads ground clearance {dist:.3f} m")


if __name__ == "__main__":
    main()
