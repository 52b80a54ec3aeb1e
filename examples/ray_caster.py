"""Persistent ray casters (reference
`crates/avian2d/examples/ray_caster.rs`): `RayCaster` components attached
to a body follow it and report hits every step — here a spinning body's
rays sweep a ring of pillars."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step
from avian_tpu.pipeline.broadphase import update_aabbs
from avian_tpu.queries import QueryFilter
from avian_tpu.queries.accel import RayCasters, update_ray_casters

CFG = PhysicsConfig(max_colors=4)


def main():
    b = SceneBuilder()
    # A kinematic "radar" spinning about Y at 1 rad/s.
    radar = b.add_body(
        body_type=BodyType.KINEMATIC, pos=(0.0, 1.0, 0.0),
        ang_vel=(0.0, 1.0, 0.0),
    )
    b.sphere(radar, 0.2)
    # Four pillars on the axes at distance 5.
    for px, pz in ((5, 0), (-5, 0), (0, 5), (0, -5)):
        p = b.add_body(body_type=BodyType.STATIC, pos=(px, 1.0, pz))
        b.box(p, 0.4, 2.0, 0.4)
    world = b.finalize(max_bodies=8, max_colliders=8, max_contacts=32)

    # Two persistent casters in the radar's LOCAL frame: forward (+x) and
    # up (+y, must always miss).
    casters = RayCasters.create([
        {"body": radar, "origin": (0, 0, 0), "direction": (1, 0, 0),
         "max_distance": 20.0},
        {"body": radar, "origin": (0, 0, 0), "direction": (0, 1, 0),
         "max_distance": 20.0},
    ])

    # Exclude the radar's own collider (the reference excludes the
    # caster's entity with SpatialQueryFilter::from_excluded_entities).
    import jax.numpy as jnp

    excl = jnp.zeros(world.colliders.capacity, bool).at[0].set(True)
    qf = QueryFilter(excluded=excl)

    step = jax.jit(lambda w: physics_step(w, CFG))
    scan = jax.jit(
        lambda w: update_ray_casters(update_aabbs(w, CFG), casters,
                                     qfilter=qf)
    )

    hits_seen = set()
    for k in range(150):  # 2.5 rad of spin: crosses >= 2 pillars
        world = step(world)
        hit = scan(world)
        if bool(hit.hit[0]):
            hits_seen.add(int(hit.collider[0]))
            d = float(hit.distance[0])
            assert 4.2 < d < 5.0, f"pillar face at ~4.6, got {d}"
        assert not bool(hit.hit[1]), "up-ray must never hit"

    # Over a full sweep the forward ray has crossed at least 2 pillars.
    assert len(hits_seen) >= 2, hits_seen
    print(f"ray_caster: swept pillars, hit colliders {sorted(hits_seen)}")


if __name__ == "__main__":
    main()
