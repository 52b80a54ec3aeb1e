"""Conveyor belt via collision hooks: inject a surface velocity into
contacts with the belt (reference `conveyor_belt.rs` example; hooks =
``CollisionHooks::modify_contacts``)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import numpy as np
import jax.numpy as jnp

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step

BELT_BODY = 0
BELT_SPEED = 2.0  # m/s along +x


class ConveyorHooks:
    """Static hook object (hashable by identity)."""

    def modify_contacts(self, world, contacts):
        on_belt = (contacts.body_a == BELT_BODY) | (
            contacts.body_b == BELT_BODY
        )
        # Surface velocity is added to the relative velocity (b - a):
        # moving the OTHER body along +x means the belt surface moves -x
        # relative to it when the belt is body a.
        sign = jnp.where(contacts.body_a == BELT_BODY, -1.0, 1.0)
        sv = jnp.where(
            on_belt[:, None],
            sign[:, None] * jnp.asarray([BELT_SPEED, 0.0, 0.0]),
            contacts.surface_velocity,
        )
        return contacts.replace(surface_velocity=sv)


HOOKS = ConveyorHooks()


def main():
    b = SceneBuilder()
    belt = b.add_body(body_type=BodyType.STATIC)
    assert belt == BELT_BODY
    b.box(belt, 5.0, 0.25, 2.0, friction=1.0)
    box = b.add_body(pos=(-3.0, 0.6, 0.0))
    b.box(box, 0.3, 0.3, 0.3, friction=1.0)
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)

    config = PhysicsConfig()
    for i in range(180):
        world = physics_step(world, config, hooks=HOOKS)
        if i % 30 == 0:
            p = np.asarray(world.bodies.pos[box])
            v = np.asarray(world.bodies.lin_vel[box])
            print(f"t={float(world.time):4.2f}  x={p[0]:6.3f}  vx={v[0]:5.2f}")


if __name__ == "__main__":
    main()
