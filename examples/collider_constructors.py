"""Collider constructor recipes (reference
`crates/avian3d/examples/collider_constructors.rs`): data-driven
`ColliderConstructor` / `ColliderConstructorHierarchy` — shapes described
as plain dicts, spawned onto bodies by `avian_tpu.constructor`, including
the collider-from-mesh path."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from avian_tpu import (
    BodyType,
    PhysicsConfig,
    SceneBuilder,
    constructor,
    physics_step,
)

CFG = PhysicsConfig(max_colors=8)


def main():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    constructor.spawn(b, g, {"kind": "half_space", "normal": (0, 1, 0)})

    # One body per recipe kind, dropped in a line.
    recipes = [
        {"kind": "sphere", "radius": 0.4},
        {"kind": "cuboid", "x_length": 0.8, "y_length": 0.8,
         "z_length": 0.8},
        {"kind": "capsule", "radius": 0.3, "length": 0.6},
        {"kind": "cylinder", "radius": 0.35, "height": 0.8},
        {"kind": "convex_hull_from_mesh",
         "mesh": {"vertices": [(0.4, 0, 0), (-0.4, 0, 0), (0, 0.4, 0),
                               (0, -0.4, 0), (0, 0, 0.4), (0, 0, -0.4),
                               (0.25, 0.25, 0.25)],
                  "faces": []}},
    ]
    ids = []
    for i, r in enumerate(recipes):
        body = b.add_body(pos=(1.6 * i - 3.2, 1.5, 0.0))
        constructor.spawn(b, body, r)
        ids.append(body)

    # A compound via the hierarchy API: a dumbbell (two spheres + a bar).
    bell = b.add_body(pos=(0.0, 1.2, 3.0))
    constructor.spawn_hierarchy(b, bell, [
        ({"kind": "sphere", "radius": 0.3}, (-0.6, 0, 0), (0, 0, 0, 1)),
        ({"kind": "sphere", "radius": 0.3}, (0.6, 0, 0), (0, 0, 0, 1)),
        ({"kind": "cylinder", "radius": 0.1, "height": 1.2},
         (0, 0, 0), (0, 0, 0.7071068, 0.7071068)),  # bar along x
    ])
    ids.append(bell)

    w = b.finalize(max_bodies=16, max_colliders=16, max_contacts=128)

    def one(w, _):
        return physics_step(w, CFG), None

    w = jax.jit(lambda w: jax.lax.scan(one, w, None, length=240)[0])(w)

    pos = np.asarray(w.bodies.pos)[ids]
    assert np.isfinite(pos).all()
    # Everything rests on the ground (none fell through, none stuck high).
    assert (pos[:, 1] > 0.05).all(), pos[:, 1]
    assert (pos[:, 1] < 1.0).all(), pos[:, 1]
    print(
        f"collider_constructors: {len(ids)} recipe bodies settled at "
        f"y={np.round(pos[:, 1], 2).tolist()}"
    )


if __name__ == "__main__":
    main()
