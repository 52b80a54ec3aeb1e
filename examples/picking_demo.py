"""Physics picking (reference `picking.rs`): pointer rays pick bodies;
a pickable-marker mask restricts targets (PhysicsPickable mode)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, picking
from avian_tpu.pipeline.broadphase import update_aabbs


def main():
    b = SceneBuilder()
    ids = []
    for i, x in enumerate((-2.0, 0.0, 2.0)):
        body = b.add_body(body_type=BodyType.STATIC, pos=(x, 0.0, 0.0))
        b.sphere(body, 0.5)
        ids.append(body)
    world = update_aabbs(
        b.finalize(max_bodies=4, max_colliders=4, max_contacts=8),
        PhysicsConfig(max_colors=4),
    )

    # A "camera" above each sphere; pick straight down.
    hits = picking.pick_batch(
        world,
        [(-2.0, 5.0, 0.0), (0.0, 5.0, 0.0), (2.0, 5.0, 0.0)],
        [(0.0, -1.0, 0.0)] * 3,
    )
    picked = [int(c) for c in hits.collider]
    assert picked == [0, 1, 2], f"each pointer picks its sphere: {picked}"

    # Only the middle sphere is pickable (PhysicsPickable markers).
    mask = jnp.asarray([False, True, False, False])
    h = picking.pick(world, (-2.0, 5.0, 0.0), (0.0, -1.0, 0.0), pickable=mask)
    assert not bool(h.hit), "left sphere is not pickable"
    h = picking.pick(world, (0.0, 5.0, 0.0), (0.0, -1.0, 0.0), pickable=mask)
    assert bool(h.hit) and int(h.collider) == 1
    print(f"picking: pointers picked {picked}; marker mask respected")


if __name__ == "__main__":
    main()
