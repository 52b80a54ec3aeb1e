"""Grid-accelerated raycasts match brute force; persistent RayCasters."""

import jax
import jax.numpy as jnp
import numpy as np

from avian_tpu import PhysicsConfig
from avian_tpu.pipeline.broadphase import update_aabbs
from avian_tpu.queries import cast_ray
from avian_tpu.queries.accel import (
    RayCasters, build_query_grid, cast_ray_grid, update_ray_casters,
)
from avian_tpu.scenes import cube_pile

CFG = PhysicsConfig(max_colors=4)


def _world():
    world, _ = cube_pile(n_cubes=64, max_contacts=512)
    return update_aabbs(world, CFG)


def test_grid_raycast_matches_bruteforce():
    world = _world()
    grid = build_query_grid(world)
    rng = np.random.default_rng(0)
    origins = rng.uniform(-6, 6, size=(64, 3)).astype(np.float32)
    origins[:, 1] = rng.uniform(3.0, 8.0, size=64)  # above the pile
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs[:, 1] = -np.abs(dirs[:, 1]) - 0.3  # downward-ish
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    fast = jax.jit(
        jax.vmap(lambda o, d: cast_ray_grid(world, grid, o, d, 50.0))
    )(jnp.asarray(origins), jnp.asarray(dirs))
    slow = jax.jit(
        jax.vmap(lambda o, d: cast_ray(world, o, d, 50.0))
    )(jnp.asarray(origins), jnp.asarray(dirs))

    np.testing.assert_array_equal(
        np.asarray(fast.hit), np.asarray(slow.hit)
    )
    hit = np.asarray(slow.hit)
    np.testing.assert_allclose(
        np.asarray(fast.distance)[hit], np.asarray(slow.distance)[hit],
        rtol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(fast.collider)[hit], np.asarray(slow.collider)[hit]
    )


def test_persistent_ray_casters_follow_body():
    world = _world()
    # Caster attached to cube body 1, pointing down from its center.
    casters = RayCasters.create(
        [dict(body=1, origin=(0, 0, 0), direction=(0, -1, 0),
              max_distance=100.0)]
    )
    hits = jax.jit(lambda w, c: update_ray_casters(w, c))(world, casters)
    assert bool(hits.hit[0])
    # It should hit something below (ground or another cube), not itself:
    # the ray starts inside body 1's own collider -> solid hit at t=0 is
    # that collider. The reference's RayCaster excludes its own entity;
    # mimic via qfilter in a second call.
    from avian_tpu.queries.filter import QueryFilter

    excl = jnp.zeros((world.colliders.capacity,), bool).at[1].set(True)
    qf = QueryFilter(excluded=excl)
    hits2 = jax.jit(
        lambda w, c: update_ray_casters(w, c, qfilter=qf)
    )(world, casters)
    assert bool(hits2.hit[0])
    assert int(hits2.collider[0]) != 1


def test_rays_hit_cylinder_cone_convex():
    """New ray branches: cylinder flat caps, cone side, hull face."""
    import jax.numpy as jnp
    from avian_tpu import BodyType, SceneBuilder

    b = SceneBuilder()
    cyl = b.add_body(body_type=BodyType.STATIC, pos=(0, 0, 0))
    b.cylinder(cyl, 0.5, 2.0)
    cone = b.add_body(body_type=BodyType.STATIC, pos=(3, 0, 0))
    b.cone(cone, 0.5, 1.0)
    hull = b.add_body(body_type=BodyType.STATIC, pos=(6, 0, 0))
    b.convex_hull(
        hull, [(sx * 0.5, sy * 0.5, sz * 0.5)
               for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=8)

    # Down onto the cylinder cap: t = 2 - 1 = 1, normal +y.
    h = jax.jit(lambda w: cast_ray(w, (0.0, 2.0, 0.0), (0.0, -1.0, 0.0), 10.0))(world)
    assert bool(h.hit) and abs(float(h.distance) - 1.0) < 1e-3
    assert float(h.normal[1]) > 0.99

    # Sideways into the cone at base height y=-0.4: radius there = 0.45.
    h = jax.jit(lambda w: cast_ray(w, (5.0, -0.4, 0.0), (-1.0, 0.0, 0.0), 10.0))(world)
    assert bool(h.hit) and int(h.collider) == 1
    r_at = 0.5 * (0.5 + 0.4) / 1.0
    assert abs(float(h.distance) - (2.0 - r_at)) < 1e-2

    # Into the hull cube face at x = 6 - 0.5.
    h = jax.jit(lambda w: cast_ray(w, (4.3, 0.0, 0.0), (1.0, 0.0, 0.0), 10.0))(world)
    assert bool(h.hit) and int(h.collider) == 2
    assert abs(float(h.distance) - 1.2) < 2e-2


def test_persistent_shape_casters():
    from avian_tpu import ShapeType
    from avian_tpu.queries.accel import ShapeCasters, update_shape_casters

    world = _world()
    casters = ShapeCasters.create(
        [dict(shape_type=int(ShapeType.SPHERE), params=(0.4,),
              origin=(0.0, 12.0, 0.0), direction=(0.0, -1.0, 0.0),
              max_distance=50.0)]
    )
    hits = update_shape_casters(world, casters)
    assert bool(hits.hit[0])
    assert float(hits.distance[0]) < 12.0
