"""Kinematic character 3D (reference
`crates/avian3d/examples/kinematic_character_3d.rs`): the move-and-slide
controller in full 3D — climbs a ramp, walks across a platform, and is
stopped by a wall, with no dynamic body involved."""

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
    # Ramp up to a platform at y = 0.6, then a wall at the far end.
    ang = np.pi / 14.0
    s, c = np.sin(ang / 2.0), np.cos(ang / 2.0)
    ramp = b.add_body(
        body_type=BodyType.STATIC, pos=(2.6, 0.28, 0.0),
        quat=(0.0, 0.0, s, c),
    )
    b.box(ramp, 1.6, 0.08, 2.0)
    plat = b.add_body(body_type=BodyType.STATIC, pos=(5.6, 0.52, 0.0))
    b.box(plat, 1.6, 0.08, 2.0)
    wall = b.add_body(body_type=BodyType.STATIC, pos=(7.6, 2.0, 0.0))
    b.box(wall, 0.3, 2.0, 4.0)
    world = update_aabbs(
        b.finalize(max_bodies=8, max_colliders=8, max_contacts=32), CFG
    )

    mas = jax.jit(move_and_slide, static_argnames=("shape_type", "config"))
    pos = np.asarray([0.0, 0.91, 0.0], np.float32)
    dt = 1.0 / 30.0
    for _ in range(120):  # 4 s of walking toward +x
        vel = np.asarray([2.0, -1.0, 0.0], np.float32)
        pos, vel, normal = mas(
            world, ShapeType.CAPSULE, (0.5, 0.4), pos, ID, vel, dt
        )
        pos = np.array(pos)

    assert np.isfinite(pos).all()
    # On the platform, stopped at the wall face (x = 7.3 - capsule 0.4).
    assert pos[0] > 5.5, f"did not cross the ramp: {pos}"
    assert pos[0] < 7.05, f"went through the wall: {pos}"
    assert pos[1] > 1.3, f"sank through the platform: {pos}"
    print(
        f"kinematic_character_3d: on platform at x={pos[0]:.2f}, "
        f"y={pos[1]:.2f}, wall face 7.3"
    )


if __name__ == "__main__":
    main()
