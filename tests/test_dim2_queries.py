"""2D spatial queries: analytic expectations against simple scenes.

Mirrors the 3D query tests for the dedicated [N,2] profile; reference
surface: ``SpatialQuery`` methods (``src/spatial_query/system_param.rs``)
compiled as ``avian2d``.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from avian_tpu.core.types import BodyType
from avian_tpu.dim2 import SceneBuilder2D
from avian_tpu.dim2 import queries as q
from avian_tpu.queries.filter import QueryFilter


@pytest.fixture(scope="module")
def world():
    """Circle at (0,0) r=1; box half-extents (1,1) at (5,0); capsule
    (r=0.5, len=2, vertical) at (10, 0); ground half-space y=-3;
    rounded rect (r=0.25) at (-5, 0); static everything (queries only)."""
    b = SceneBuilder2D()
    ground = b.add_body(pos=(0.0, -3.0), body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0.0, 1.0))
    c1 = b.add_body(pos=(0.0, 0.0), body_type=BodyType.STATIC)
    b.circle(c1, 1.0)
    c2 = b.add_body(pos=(5.0, 0.0), body_type=BodyType.STATIC)
    b.box(c2, 1.0, 1.0)
    c3 = b.add_body(pos=(10.0, 0.0), body_type=BodyType.STATIC)
    b.capsule(c3, 0.5, 2.0)
    c4 = b.add_body(pos=(-5.0, 0.0), body_type=BodyType.STATIC)
    b.round_rectangle(c4, 2.0, 2.0, 0.25)  # half-extents 1,1 + r=0.25
    w = b.finalize()
    return w


def test_ray_hits_circle(world):
    hit = q.cast_ray(world, (-3.0, 0.0), (1.0, 0.0))
    assert bool(hit.hit)
    assert float(hit.distance) == pytest.approx(2.0, abs=1e-4)
    np.testing.assert_allclose(
        np.asarray(hit.point), [-1.0, 0.0], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(hit.normal), [-1.0, 0.0], atol=1e-4
    )


def test_ray_hits_box_face(world):
    hit = q.cast_ray(world, (5.0, 4.0), (0.0, -1.0))
    assert bool(hit.hit)
    assert float(hit.distance) == pytest.approx(3.0, abs=1e-4)
    np.testing.assert_allclose(np.asarray(hit.normal), [0.0, 1.0], atol=1e-4)


def test_ray_hits_rounded_corner(world):
    # 45deg ray into the rounded rect's top-right corner arc: the surface
    # along the diagonal from the corner vertex (at (-4, 1)) is at
    # vertex + 0.25/sqrt(2) * (1,1).
    o = np.asarray([-4.0 + 2.0, 1.0 + 2.0])  # from (-2, 3) toward corner
    d = np.asarray([-1.0, -1.0]) / np.sqrt(2.0)
    hit = q.cast_ray(world, o, d)
    assert bool(hit.hit)
    corner = np.asarray([-4.0, 1.0])
    expect_pt = corner + 0.25 * np.asarray([1.0, 1.0]) / np.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(hit.point), expect_pt, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(hit.normal), [1.0 / np.sqrt(2)] * 2, atol=1e-3
    )


def test_ray_hits_capsule_cap(world):
    hit = q.cast_ray(world, (10.0, 5.0), (0.0, -1.0))
    assert bool(hit.hit)
    # Capsule: segment half-length 1 vertical + r=0.5 -> top at y=1.5.
    assert float(hit.distance) == pytest.approx(3.5, abs=1e-4)


def test_ray_ground_plane(world):
    hit = q.cast_ray(world, (100.0, 2.0), (0.0, -1.0))
    assert bool(hit.hit)
    assert float(hit.distance) == pytest.approx(5.0, abs=1e-4)
    np.testing.assert_allclose(np.asarray(hit.normal), [0.0, 1.0], atol=1e-5)


def test_ray_solid_vs_hollow(world):
    inside = q.cast_ray(world, (0.0, 0.0), (1.0, 0.0), solid=True)
    assert bool(inside.hit) and float(inside.distance) == pytest.approx(0.0)
    hollow = q.cast_ray(world, (0.0, 0.0), (1.0, 0.0), solid=False)
    assert bool(hollow.hit)
    assert float(hollow.distance) == pytest.approx(1.0, abs=1e-4)


def test_ray_max_distance_and_miss(world):
    miss = q.cast_ray(world, (-3.0, 0.0), (1.0, 0.0), max_distance=1.0)
    assert not bool(miss.hit)
    up = q.cast_ray(world, (0.0, 5.0), (0.0, 1.0))
    assert not bool(up.hit)


def test_ray_hits_multi(world):
    # Horizontal ray through circle (2 crossings counts once), box, capsule.
    hits = q.ray_hits(world, (-3.0, 0.0), (1.0, 0.0), max_hits=4)
    got = [int(c) for c, h in zip(hits.collider, hits.hit) if bool(h)]
    assert len(got) == 3
    d = np.asarray(hits.distance)[: len(got)]
    assert np.all(np.diff(d) > 0)  # sorted by distance
    assert d[0] == pytest.approx(2.0, abs=1e-4)   # circle
    assert d[1] == pytest.approx(7.0, abs=1e-4)   # box left face at x=4
    assert d[2] == pytest.approx(12.5, abs=1e-4)  # capsule at x=9.5


def test_project_point(world):
    res = q.project_point(world, (0.0, 2.5))
    assert bool(res["hit"])
    assert int(res["body"]) == 1  # circle body
    np.testing.assert_allclose(
        np.asarray(res["point"]), [0.0, 1.0], atol=1e-4
    )
    assert float(res["distance"]) == pytest.approx(1.5, abs=1e-4)

    inside = q.project_point(world, (5.0, 0.2), solid=True)
    assert bool(inside["is_inside"])
    np.testing.assert_allclose(
        np.asarray(inside["point"]), [5.0, 0.2], atol=1e-5
    )

    surf = q.project_point(world, (5.0, 0.2), solid=False)
    # Nearest box face is y=+1 from (5.0, 0.2)? dist 0.8 vs x faces dist 1.0.
    np.testing.assert_allclose(
        np.asarray(surf["point"]), [5.0, 1.0], atol=1e-4
    )


def test_point_intersections(world):
    idx = q.point_intersections(world, (5.0, 0.0), max_hits=4)
    got = set(int(i) for i in idx if int(i) >= 0)
    assert got == {2}  # the box collider only
    idx2 = q.point_intersections(world, (0.0, -5.0), max_hits=4)
    got2 = set(int(i) for i in idx2 if int(i) >= 0)
    assert got2 == {0}  # inside the ground half-space


def test_shape_intersections(world):
    circle = q.shape_circle(1.0)
    idx = q.shape_intersections(world, circle, (4.0, 0.0), max_hits=4)
    got = set(int(i) for i in idx if int(i) >= 0)
    assert 2 in got  # overlaps the box (gap 0, radius 1 over x in [3,5])
    idx2 = q.shape_intersections(world, circle, (2.5, 0.0), max_hits=4)
    got2 = set(int(i) for i in idx2 if int(i) >= 0)
    assert got2 == set()  # between circle (ends 1) and box (starts 4)


def test_aabb_intersections(world):
    from avian_tpu.core.config import PhysicsConfig
    from avian_tpu.dim2.broadphase import update_aabbs

    w = update_aabbs(world, PhysicsConfig(substeps=2))
    idx = q.aabb_intersections(w, (4.5, -0.5), (5.5, 0.5), max_hits=8)
    got = set(int(i) for i in idx if int(i) >= 0)
    assert 2 in got
    assert 1 not in got


def test_cast_shape(world):
    circle = q.shape_circle(0.5)
    hit = q.cast_shape(world, circle, (5.0, 5.0), 0.0, (0.0, -1.0), 20.0)
    assert bool(hit.hit)
    assert int(hit.collider) == 2
    # Circle bottom touches box top (y=1) when center reaches y=1.5.
    assert float(hit.distance) == pytest.approx(3.5, abs=5e-3)
    np.testing.assert_allclose(np.asarray(hit.normal), [0.0, 1.0], atol=1e-2)


def test_cast_shape_box_query(world):
    box = q.shape_rect(0.5, 0.5)
    hit = q.cast_shape(world, box, (-3.0, 0.0), 0.0, (1.0, 0.0), 20.0)
    assert bool(hit.hit)
    assert int(hit.collider) == 1  # the unit circle
    # Box right face (x offset +0.5) meets circle left point (-1, 0).
    assert float(hit.distance) == pytest.approx(1.5, abs=5e-3)


def test_shape_hits_ordering(world):
    circle = q.shape_circle(0.4)
    hits = q.shape_hits(
        world, circle, (-3.0, 0.0), 0.0, (1.0, 0.0), 30.0, max_hits=4
    )
    got = [int(c) for c, h in zip(hits.collider, hits.hit) if bool(h)]
    assert got[:2] == [1, 2]  # circle then box, nearest first
    d = np.asarray(hits.distance)
    assert d[0] < d[1]


def test_filters_and_predicates(world):
    # Exclude the circle collider -> ray continues to the box.
    excluded = jnp.zeros((world.colliders.capacity,), bool).at[1].set(True)
    hit = q.cast_ray(
        world, (-3.0, 0.0), (1.0, 0.0),
        qfilter=QueryFilter(excluded=excluded),
    )
    assert int(hit.collider) == 2
    assert float(hit.distance) == pytest.approx(7.0, abs=1e-4)

    # Predicate variant: only bodies with index >= 2.
    hit2 = q.cast_ray_predicate(
        world, (-3.0, 0.0), (1.0, 0.0),
        predicate=lambda w, ids: w.colliders.body_idx[ids] >= 2,
    )
    assert int(hit2.collider) == 2

    res = q.project_point_predicate(
        world, (0.0, 2.5),
        predicate=lambda w, ids: w.colliders.body_idx[ids] != 1,
    )
    assert int(res["body"]) != 1


def test_segment_and_polygon_rays():
    """Sharp (radius 0) segment and triangle colliders."""
    b = SceneBuilder2D()
    s = b.add_body(pos=(0.0, 0.0), body_type=BodyType.STATIC)
    b.segment(s, (-1.0, 1.0), (1.0, 1.0))
    t = b.add_body(pos=(4.0, 0.0), body_type=BodyType.STATIC)
    b.triangle(t, (-1.0, 0.0), (1.0, 0.0), (0.0, 2.0))
    w = b.finalize()

    hit = q.cast_ray(w, (0.0, 3.0), (0.0, -1.0))
    assert bool(hit.hit)
    assert float(hit.distance) == pytest.approx(2.0, abs=1e-4)

    hit2 = q.cast_ray(w, (4.0, 3.0), (0.0, -1.0))
    assert bool(hit2.hit)
    assert float(hit2.distance) == pytest.approx(1.0, abs=1e-4)

    # Ray passing beside the segment endpoint misses.
    miss = q.cast_ray(w, (1.5, 3.0), (0.0, -1.0))
    assert not bool(miss.hit) or int(miss.collider) != 0
