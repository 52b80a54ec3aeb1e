"""Mixed-shape stress: spheres, boxes, capsules, cylinders and cones rain
onto a plane (reference ``examples/many_shapes`` — dispatch breadth test).

Run: python examples/many_shapes.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.pipeline.step import rollout


def main():
    rng = np.random.default_rng(7)
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    ids = []
    n = 150
    for k in range(n):
        x = (k % 12) * 1.1 - 6.5 + rng.uniform(-0.05, 0.05)
        z = ((k // 12) % 12) * 1.1 - 6.5 + rng.uniform(-0.05, 0.05)
        y = 1.0 + (k // 144) * 1.5
        body = b.add_body(pos=(x, y, z))
        kind = k % 5
        if kind == 0:
            b.sphere(body, 0.4)
        elif kind == 1:
            b.box(body, 0.35, 0.35, 0.35)
        elif kind == 2:
            b.capsule(body, 0.25, 0.5)
        elif kind == 3:
            b.cylinder(body, 0.3, 0.7)
        else:
            b.cone(body, 0.35, 0.7)
        ids.append(body)
    world = b.finalize(
        max_bodies=n + 1, max_colliders=n + 1, max_contacts=8 * (n + 1)
    )

    config = PhysicsConfig()
    roll = jax.jit(lambda w: rollout(w, config, 60))
    for _ in range(5):
        world = roll(world)
    pos = np.asarray(world.bodies.pos)[np.asarray(ids)]
    assert np.isfinite(pos).all(), "mixed-shape scene diverged"
    # Nothing fell through the ground.
    assert (pos[:, 1] > 0.0).all(), f"fell through: min y={pos[:,1].min():.3f}"
    sleeping = int(np.asarray(world.bodies.sleeping)[np.asarray(ids)].sum())
    print(f"many_shapes OK: {n} mixed shapes resting, min y="
          f"{pos[:,1].min():.2f}, sleeping {sleeping}/{n}")


if __name__ == "__main__":
    main()
