"""Collision layers (reference `collision_layers.rs`): 32-bit
memberships x filters decide who collides with whom
(`layers.rs:423`: interacts iff (m1 & f2) && (m2 & f1))."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step
from avian_tpu.pipeline.step import rollout

GROUND = 0b001
RED = 0b010
BLUE = 0b100


def main():
    b = SceneBuilder()
    ground = b.add_body(body_type=BodyType.STATIC)
    # Ground collides with everything.
    b.half_space(ground, normal=(0, 1, 0), layer_members=GROUND,
                 layer_filter=RED | BLUE)
    # A red platform that only collides with red balls.
    plat = b.add_body(body_type=BodyType.STATIC, pos=(0, 2.0, 0))
    b.box(plat, 2.0, 0.2, 2.0, layer_members=RED, layer_filter=RED)

    red = b.add_body(pos=(-0.5, 4.0, 0))
    b.sphere(red, 0.3, layer_members=RED, layer_filter=RED | GROUND)
    blue = b.add_body(pos=(0.5, 4.0, 0))
    b.sphere(blue, 0.3, layer_members=BLUE, layer_filter=BLUE | GROUND)

    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    world = rollout(world, PhysicsConfig(max_colors=4), 240)

    red_y = float(world.bodies.pos[red][1])
    blue_y = float(world.bodies.pos[blue][1])
    assert abs(red_y - 2.5) < 0.05, f"red should rest ON the platform: {red_y}"
    assert abs(blue_y - 0.3) < 0.05, f"blue should fall THROUGH: {blue_y}"
    print(f"layers: red rests at {red_y:.2f}, blue fell through to {blue_y:.2f}")


if __name__ == "__main__":
    main()
