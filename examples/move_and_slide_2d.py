"""move_and_slide 2D (reference `crates/avian2d/examples/move_and_slide_2d.rs`):
the planar move-and-slide profile — a capsule walking up a shallow ramp
keeps its horizontal speed (slides along the slope instead of stopping)."""

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
    # A 15-degree ramp starting at x = 1.5 (a rotated long box).
    ang = np.pi / 12.0
    s, c = np.sin(ang / 2.0), np.cos(ang / 2.0)
    ramp = b.add_body(
        body_type=BodyType.STATIC, pos=(4.0, 0.3, 0.0),
        quat=(0.0, 0.0, s, c),  # about Z: the 2D rotation axis
    )
    b.box(ramp, 3.0, 0.3, 2.0)
    world = update_aabbs(
        b.finalize(max_bodies=4, max_colliders=4, max_contacts=16), CFG
    )

    mas = jax.jit(move_and_slide, static_argnames=("shape_type", "config"))
    pos = np.asarray([0.0, 0.91, 0.0], np.float32)
    dt = 1.0 / 30.0
    for _ in range(90):  # 3 s walking toward +x, onto and up the ramp
        vel = np.asarray([2.0, -1.0, 0.0], np.float32)
        pos, vel, normal = mas(
            world, ShapeType.CAPSULE, (0.5, 0.4), pos, ID, vel, dt
        )
        pos = np.array(pos)
        pos[2] = 0.0  # plane constraint: the 2D profile of the controller

    assert np.isfinite(pos).all()
    assert abs(pos[2]) < 1e-6
    # Slid up the ramp: well past its foot AND gained height.
    assert pos[0] > 3.0, f"did not walk: {pos}"
    assert pos[1] > 1.1, f"did not climb the ramp: {pos}"
    print(f"move_and_slide_2d: climbed ramp to x={pos[0]:.2f}, y={pos[1]:.2f}")


if __name__ == "__main__":
    main()
