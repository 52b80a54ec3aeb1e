"""Predicate raycasts (reference `cast_ray_predicate.rs`): a user mask
function filters which colliders a ray may hit — here, rays pass through
"glass" bodies."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.pipeline.broadphase import update_aabbs
from avian_tpu.queries import cast_ray, cast_ray_predicate

GLASS = []


def main():
    b = SceneBuilder()
    glass = b.add_body(body_type=BodyType.STATIC, pos=(2.0, 0, 0))
    b.box(glass, 0.5, 2.0, 2.0)          # collider 0: glass pane
    wall = b.add_body(body_type=BodyType.STATIC, pos=(6.0, 0, 0))
    b.box(wall, 0.5, 2.0, 2.0)           # collider 1: solid wall
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=8)
    world = update_aabbs(world, PhysicsConfig(max_colors=4))

    glass_colliders = jnp.asarray([True, False, False, False])

    plain = cast_ray(world, (0.0, 0, 0), (1.0, 0, 0))
    assert int(plain.collider) == 0, "plain ray hits the glass first"

    seethru = cast_ray_predicate(
        world, (0.0, 0, 0), (1.0, 0, 0),
        lambda w, ids: ~glass_colliders[ids],
    )
    assert int(seethru.collider) == 1, "predicate ray skips the glass"
    assert abs(float(seethru.distance) - 5.5) < 1e-3
    print(f"predicate ray passed the glass, hit wall at "
          f"{float(seethru.distance):.2f}")


if __name__ == "__main__":
    main()
