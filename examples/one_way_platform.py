"""One-way platform via collision hooks (reference
`one_way_platform_2d.rs`): contacts are disabled unless the body comes from
above (contact normal opposing the platform's up axis)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import numpy as np
import jax.numpy as jnp

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step

PLATFORM_BODY = 1


class OneWayHooks:
    def modify_contacts(self, world, contacts):
        involved = (contacts.body_a == PLATFORM_BODY) | (
            contacts.body_b == PLATFORM_BODY
        )
        # Normal from a to b; pass-through when the other body is below.
        up = jnp.asarray([0.0, 1.0, 0.0])
        n_to_other = jnp.where(
            (contacts.body_a == PLATFORM_BODY)[:, None],
            contacts.normal,
            -contacts.normal,
        )
        from_above = jnp.sum(n_to_other * up, axis=-1) > 0.5
        keep = ~involved | from_above
        return contacts.replace(
            touching=contacts.touching & keep,
            num_points=jnp.where(keep, contacts.num_points, 0),
        )


HOOKS = OneWayHooks()


def main():
    b = SceneBuilder()
    ground = b.add_body(body_type=BodyType.STATIC, pos=(0, -3, 0))
    b.half_space(ground, normal=(0, 1, 0))
    plat = b.add_body(body_type=BodyType.STATIC, pos=(0, 0, 0))
    assert plat == PLATFORM_BODY
    b.box(plat, 2.0, 0.1, 2.0)

    # Ball A falls from above: lands on the platform.
    a = b.add_body(pos=(0.5, 2.0, 0))
    b.sphere(a, 0.3)
    # Ball B thrown up from below: passes through, then lands on top.
    c = b.add_body(pos=(-0.5, -2.0, 0), lin_vel=(0, 9.0, 0))
    b.sphere(c, 0.3)

    world = b.finalize(max_bodies=8, max_colliders=8, max_contacts=32)
    config = PhysicsConfig()
    for i in range(240):
        world = physics_step(world, config, hooks=HOOKS)
        if i % 40 == 0:
            ya = float(world.bodies.pos[a][1])
            yc = float(world.bodies.pos[c][1])
            print(f"t={float(world.time):4.2f}  from_above y={ya:6.3f}  "
                  f"from_below y={yc:6.3f}")


if __name__ == "__main__":
    main()
