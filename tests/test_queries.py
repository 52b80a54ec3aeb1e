"""Spatial query tests (raycast / point / intersections / shapecast)."""

import numpy as np
import jax.numpy as jnp

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, ShapeType
from avian_tpu.pipeline.broadphase import update_aabbs
from avian_tpu.queries import (
    QueryFilter,
    aabb_intersections,
    cast_ray,
    cast_shape,
    point_intersections,
    project_point,
    ray_hits,
    shape_intersections,
)

from conftest import TEST_SHAPE_PAIRS
CFG = PhysicsConfig(max_colors=4, shape_pairs=TEST_SHAPE_PAIRS)


def _world():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))                       # collider 0
    s = b.add_body(body_type=BodyType.STATIC, pos=(0, 2, 0))
    b.sphere(s, 0.5)                                        # collider 1
    bx = b.add_body(body_type=BodyType.STATIC, pos=(3, 1, 0))
    b.box(bx, 1.0, 1.0, 1.0)                                # collider 2
    cp = b.add_body(body_type=BodyType.STATIC, pos=(-3, 1, 0))
    b.capsule(cp, 0.4, 1.2, layer_members=0b10, layer_filter=0b10)  # collider 3
    w = b.finalize(max_bodies=8, max_colliders=8, max_contacts=16)
    return update_aabbs(w, CFG)


def test_cast_ray_sphere():
    w = _world()
    hit = cast_ray(w, (0, 5, 0), (0, -1, 0))
    assert bool(hit.hit)
    assert int(hit.collider) == 1
    np.testing.assert_allclose(float(hit.distance), 2.5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hit.normal), [0, 1, 0], atol=1e-4)


def test_cast_ray_box_and_plane():
    w = _world()
    hit = cast_ray(w, (3, 5, 0), (0, -1, 0))
    assert int(hit.collider) == 2
    np.testing.assert_allclose(float(hit.distance), 3.0, atol=1e-4)
    # Beyond the box in x: hits the ground plane.
    hit = cast_ray(w, (10, 5, 0), (0, -1, 0))
    assert int(hit.collider) == 0
    np.testing.assert_allclose(float(hit.distance), 5.0, atol=1e-4)


def test_ray_hits_multiple_sorted():
    w = _world()
    hits = ray_hits(w, (0, 5, 0), (0, -1, 0), max_hits=4)
    found = np.asarray(hits.collider[np.asarray(hits.hit)])
    dists = np.asarray(hits.distance[np.asarray(hits.hit)])
    assert found[0] == 1 and 0 in found
    assert np.all(np.diff(dists) >= 0)


def test_ray_filter_layers():
    w = _world()
    # Capsule is on layer 2; a layer-1 query must pass through it.
    hit = cast_ray(w, (-3, 5, 0), (0, -1, 0), qfilter=QueryFilter(mask=jnp.asarray(0b01, jnp.uint32)))
    assert int(hit.collider) == 0  # ground
    hit = cast_ray(w, (-3, 5, 0), (0, -1, 0), qfilter=QueryFilter(mask=jnp.asarray(0b10, jnp.uint32)))
    assert int(hit.collider) == 3


def test_ray_max_distance_and_inside():
    w = _world()
    miss = cast_ray(w, (0, 5, 0), (0, -1, 0), max_distance=1.0)
    assert not bool(miss.hit)
    inside = cast_ray(w, (0, 2, 0), (1, 0, 0), solid=True)
    assert int(inside.collider) == 1 and float(inside.distance) == 0.0
    exiting = cast_ray(w, (0, 2, 0), (1, 0, 0), solid=False)
    assert int(exiting.collider) == 1
    np.testing.assert_allclose(float(exiting.distance), 0.5, atol=1e-4)


def test_project_point():
    w = _world()
    res = project_point(w, (0, 4, 0))
    assert int(res["collider"]) == 1
    np.testing.assert_allclose(np.asarray(res["point"]), [0, 2.5, 0], atol=1e-4)
    np.testing.assert_allclose(float(res["distance"]), 1.5, atol=1e-4)
    inside = project_point(w, (0, 2.1, 0))
    assert bool(inside["is_inside"])


def test_point_intersections():
    w = _world()
    idx = np.asarray(point_intersections(w, (3, 1, 0)))
    assert 2 in idx
    idx = np.asarray(point_intersections(w, (0, 10, 0)))
    assert np.all(idx == -1)


def test_aabb_and_shape_intersections():
    w = _world()
    idx = np.asarray(aabb_intersections(w, (2, 0.2, -1), (4, 2, 1)))
    assert 2 in idx
    idx = np.asarray(
        shape_intersections(w, ShapeType.SPHERE, (1.0,), (0, 2.4, 0), (0, 0, 0, 1))
    )
    assert 1 in idx


def test_cast_shape_sphere_onto_plane():
    w = _world()
    hit = cast_shape(
        w, ShapeType.SPHERE, (0.5,), (10, 5, 0), (0, 0, 0, 1), (0, -1, 0), 10.0
    )
    assert bool(hit.hit)
    assert int(hit.collider) == 0
    np.testing.assert_allclose(float(hit.distance), 4.5, atol=5e-3)
    np.testing.assert_allclose(np.asarray(hit.normal), [0, 1, 0], atol=1e-3)


def test_shape_hits_multiple_sorted():
    """shape_hits returns successive hits nearest-first."""
    from avian_tpu.queries import shape_hits
    from avian_tpu import BodyType, SceneBuilder, ShapeType
    from avian_tpu.pipeline.broadphase import update_aabbs
    import jax

    b = SceneBuilder()
    for x in (2.0, 5.0, 8.0):
        body = b.add_body(body_type=BodyType.STATIC, pos=(x, 0.0, 0.0))
        b.box(body, 0.5, 2.0, 2.0)
    w = update_aabbs(
        b.finalize(max_bodies=4, max_colliders=4, max_contacts=16), CFG
    )
    hits = jax.jit(
        lambda w: shape_hits(
            w, ShapeType.SPHERE, (0.4,), (-2.0, 0.0, 0.0),
            (0.0, 0.0, 0.0, 1.0), (1.0, 0.0, 0.0), 20.0, max_hits=3,
        ),
        static_argnums=(),
    )(w)
    d = np.asarray(hits.distance)
    assert bool(hits.hit.all())
    # Walls at x=1.5/4.5/7.5 faces; sphere radius 0.4 from x=-2.
    assert abs(d[0] - 3.1) < 0.05 and abs(d[1] - 6.1) < 0.05
    assert abs(d[2] - 9.1) < 0.05
    assert list(np.asarray(hits.collider)) == [0, 1, 2]


def _three_spheres():
    b = SceneBuilder()
    ids = []
    for i, x in enumerate((-2.0, 0.0, 2.0)):
        body = b.add_body(body_type=BodyType.STATIC, pos=(x, 0, 0))
        b.sphere(body, 0.5)                       # collider i
        ids.append(body)
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=8)
    return update_aabbs(w, CFG), ids


def test_cast_ray_predicate():
    """Predicate variants (``system_param.rs:8-12,194``): a user mask
    function evaluated per candidate filters hits."""
    from avian_tpu.queries import cast_ray, cast_ray_predicate

    world, ids = _three_spheres()
    origin = (-10.0, 0.0, 0.0)
    direction = (1.0, 0.0, 0.0)
    plain = cast_ray(world, origin, direction)
    assert bool(plain.hit) and int(plain.collider) == 0  # nearest

    # Skip the nearest collider via predicate: hit the second instead.
    hit = cast_ray_predicate(
        world, origin, direction,
        lambda w, i: i != int(plain.collider),
    )
    assert bool(hit.hit)
    assert int(hit.collider) != int(plain.collider)
    assert float(hit.distance) > float(plain.distance)


def test_project_point_predicate():
    from avian_tpu.queries import project_point, project_point_predicate

    world, ids = _three_spheres()
    res = project_point(world, (0.1, 3.0, 0.0))
    nearest = int(res["collider"])
    res2 = project_point_predicate(
        world, (0.1, 3.0, 0.0), lambda w, i: i != nearest
    )
    assert bool(res2["hit"]) and int(res2["collider"]) != nearest


def test_picking():
    from avian_tpu import picking

    world, ids = _three_spheres()
    hit = picking.pick(world, (-10.0, 0.0, 0.0), (1.0, 0.0, 0.0))
    assert bool(hit.hit)
    # Mark only the farthest collider pickable.
    import numpy as np
    m = world.colliders.capacity
    mask = np.zeros(m, bool)
    mask[2] = True
    hit2 = picking.pick(
        world, (-10.0, 0.0, 0.0), (1.0, 0.0, 0.0),
        pickable=jnp.asarray(mask),
    )
    assert bool(hit2.hit) and int(hit2.collider) == 2
    # Batch picking.
    hits = picking.pick_batch(
        world,
        [(-10.0, 0.0, 0.0), (0.0, 10.0, 0.0)],
        [(1.0, 0.0, 0.0), (0.0, -1.0, 0.0)],
    )
    assert bool(hits.hit[0]) and bool(hits.hit[1])


def test_hermite_interpolation():
    """Hermite easing (``interpolation.rs:138-149``): endpoint match +
    velocity-aware midpoint differs from lerp under curvature."""
    import numpy as np
    from avian_tpu import BodyType, SceneBuilder
    from avian_tpu.utils.interpolation import (
        hermite_interpolate_poses,
        interpolate_poses,
    )

    b = SceneBuilder()
    body = b.add_body(
        pos=(0, 0, 0), lin_vel=(1.0, 2.0, 0), ang_vel=(0, 0, 5.0),
        mass=1.0, inertia=(1, 1, 1),
    )
    w = b.finalize(max_bodies=2, max_colliders=1, max_contacts=4)
    prev = w.bodies
    nxt = prev.replace(
        pos=prev.pos.at[body].set(jnp.asarray([1.0, 0.5, 0.0])),
        lin_vel=prev.lin_vel.at[body].set(jnp.asarray([1.0, -2.0, 0.0])),
    )
    dt = 1.0 / 60.0
    # Endpoints reproduce exactly.
    p0, q0 = hermite_interpolate_poses(prev, nxt, 0.0, dt)
    p1, q1 = hermite_interpolate_poses(prev, nxt, 1.0, dt)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(prev.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(nxt.pos), atol=1e-6)
    # Midpoint differs from lerp (velocity-aware curvature).
    ph, _ = hermite_interpolate_poses(prev, nxt, 0.5, dt)
    pl, _ = interpolate_poses(prev, nxt, 0.5)
    assert float(jnp.abs(ph[body] - pl[body]).max()) > 1e-4


def test_cast_shape_vs_convex_hull():
    """Regression: cast_shape against a hull collider must see the pool
    (the manifold call once omitted convex_verts, so every hull looked
    like a degenerate point at its origin)."""
    b = SceneBuilder()
    h = b.add_body(body_type=BodyType.STATIC, pos=(0.0, 1.0, 0.0))
    # An octahedron with "radius" 1: farthest x extent = 1.
    b.convex_hull(h, [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                      (0, 0, 1), (0, 0, -1)])
    w = update_aabbs(
        b.finalize(max_bodies=2, max_colliders=2, max_contacts=8),
        PhysicsConfig(max_colors=4),
    )
    sh = cast_shape(
        w, ShapeType.SPHERE, (0.25,), (5.0, 1.0, 0.0),
        (0.0, 0.0, 0.0, 1.0), (-1.0, 0.0, 0.0), max_distance=10.0,
    )
    assert bool(sh.hit)
    # Sphere surface meets the octahedron vertex at x=1: travel ~ 5-1-0.25.
    assert abs(float(sh.distance) - 3.75) < 0.1, sh.distance
