"""move_and_slide 3D (reference `crates/avian3d/examples/move_and_slide_3d.rs`):
a kinematic capsule walks diagonally into an angled wall and SLIDES along
it instead of stopping — the crease-aware velocity projection of
``character/move_and_slide.py``."""

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
    # A long wall rotated 45 deg about Y, crossing the character's path.
    s = np.sin(np.pi / 8), np.cos(np.pi / 8)
    wall = b.add_body(
        body_type=BodyType.STATIC, pos=(4.0, 1.5, 0.0),
        quat=(0.0, s[0], 0.0, s[1]),  # 45 deg about Y
    )
    b.box(wall, 0.3, 3.0, 8.0)
    world = update_aabbs(
        b.finalize(max_bodies=4, max_colliders=4, max_contacts=16), CFG
    )

    mas = jax.jit(move_and_slide, static_argnames=("shape_type", "config"))
    pos = np.asarray([0.0, 0.91, 0.0], np.float32)
    dt = 1.0 / 30.0
    for _ in range(90):  # 3 s walking straight at the angled wall
        vel = np.asarray([2.0, -1.0, 0.0], np.float32)
        pos, vel, normal = mas(
            world, ShapeType.CAPSULE, (0.5, 0.4), pos, ID, vel, dt
        )
        pos = np.array(pos)

    assert np.isfinite(pos).all()
    # Stayed on the near side of the wall plane (normal at 45 deg) by at
    # least ~capsule radius, but slid sideways along it (z moved).
    n = np.asarray([np.cos(np.pi / 4), 0.0, -np.sin(np.pi / 4)])
    d = float(np.dot(pos - np.asarray([4.0, 1.5, 0.0]), n))
    assert d < -0.55, f"penetrated the wall plane: d={d:.2f}, {pos}"
    assert pos[0] > 1.5, f"never reached the wall: {pos}"
    assert abs(pos[2]) > 0.8, f"did not slide along the wall: {pos}"
    print(
        f"move_and_slide_3d: slid along 45deg wall to "
        f"x={pos[0]:.2f}, z={pos[2]:.2f}"
    )


if __name__ == "__main__":
    main()
