"""Round cuboids (``Collider::round_cuboid``, reference
``parry/mod.rs:763-777``) + full-shape point-query coverage.

The round cuboid is a round convex hull: inner corners in the vertex
pool, border radius in params lane 6 (``geometry/convex.py``)."""

import jax
import jax.numpy as jnp
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.core.types import ShapeType
from avian_tpu.pipeline.step import rollout
from avian_tpu.queries import cast_ray, project_point

CFG = PhysicsConfig(
    max_colors=4,
    shape_pairs=(
        (ShapeType.PLANE, ShapeType.CONVEX),
        (ShapeType.CONVEX, ShapeType.CONVEX),
    ),
)


def _scene():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    rc = b.add_body(pos=(0.0, 0.8, 0.0))
    b.round_cuboid(rc, 1.0, 1.0, 1.0, 0.1)
    return b, g, rc


def test_round_cuboid_rests_at_outer_height():
    b, g, rc = _scene()
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    w = jax.jit(lambda w: rollout(w, CFG, 120))(w)
    pos = np.asarray(w.bodies.pos)
    assert np.isfinite(pos).all()
    # Rests on the rounded face: center at inner half extent + radius.
    assert abs(pos[rc][1] - 0.6) < 0.03, pos[rc]


def test_round_cuboid_mass_matches_steiner_volume():
    b, g, rc = _scene()
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    h, r = 0.5, 0.1
    vol = (
        8 * h**3 + 24 * h * h * r + 6 * np.pi * h * r * r
        + 4.0 / 3.0 * np.pi * r**3
    )
    got = 1.0 / float(w.bodies.inv_mass[rc])
    assert abs(got - vol) / vol < 1e-3, (got, vol)


def test_raycast_round_cuboid_face_and_corner():
    b, g, rc = _scene()
    # Keep the body where it was built (no stepping): center (0, 0.8, 0).
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    # Face hit from above: surface at y = 0.8 + 0.6.
    hit = cast_ray(w, (0.0, 3.0, 0.0), (0.0, -1.0, 0.0))
    assert bool(hit.hit)
    np.testing.assert_allclose(float(hit.distance), 3.0 - 1.4, atol=2e-2)
    # Rounded corner: ray along -x aimed at the corner sphere's center
    # line hits at inner corner x=0.5 plus the border radius.
    hit = cast_ray(w, (3.0, 0.8 + 0.5, 0.5), (-1.0, 0.0, 0.0))
    assert bool(hit.hit)
    np.testing.assert_allclose(float(hit.distance), 3.0 - 0.6, atol=2e-2)


def test_project_point_all_shapes():
    b = SceneBuilder()
    bodies = {}
    specs = [
        ("cyl", (0.0, 0.0, 0.0)),
        ("cone", (10.0, 0.0, 0.0)),
        ("seg", (20.0, 0.0, 0.0)),
        ("round", (30.0, 0.0, 0.0)),
    ]
    for name, pos in specs:
        body = b.add_body(pos=pos, body_type=BodyType.STATIC)
        bodies[name] = body
    b.cylinder(bodies["cyl"], radius=1.0, height=2.0)
    b.cone(bodies["cone"], radius=1.0, height=2.0)
    b.segment(bodies["seg"], (-1.0, 0.0, 0.0), (1.0, 0.0, 0.0))
    b.round_cuboid(bodies["round"], 1.0, 1.0, 1.0, 0.25)
    w = b.finalize(max_bodies=8, max_colliders=8, max_contacts=8)

    # Cylinder: 1.5 above the top cap -> distance 1.5, closest on the cap.
    res = project_point(w, (0.0, 2.5, 0.0))
    assert int(res["collider"]) == 0
    np.testing.assert_allclose(float(res["distance"]), 1.5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(res["point"]), [0.0, 1.0, 0.0], atol=1e-5
    )
    # Cylinder side: radial point 2 out -> distance 1.
    res = project_point(w, (2.0, 0.5, 0.0))
    np.testing.assert_allclose(float(res["distance"]), 1.0, atol=1e-5)
    # Cone apex: 0.5 above the apex (apex at y=+1).
    res = project_point(w, (10.0, 1.5, 0.0))
    assert int(res["collider"]) == 1
    np.testing.assert_allclose(float(res["distance"]), 0.5, atol=1e-5)
    # Segment: 2 above the midpoint.
    res = project_point(w, (20.0, 2.0, 0.0))
    assert int(res["collider"]) == 2
    np.testing.assert_allclose(float(res["distance"]), 2.0, atol=1e-5)
    # Round cuboid face: surface at y = 0.75.
    res = project_point(w, (30.0, 2.0, 0.0))
    assert int(res["collider"]) == 3
    np.testing.assert_allclose(float(res["distance"]), 1.25, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(res["point"]), [30.0, 0.75, 0.0], atol=5e-3
    )


def test_point_inside_cylinder_is_negative():
    b = SceneBuilder()
    body = b.add_body(pos=(0.0, 0.0, 0.0), body_type=BodyType.STATIC)
    b.cylinder(body, radius=1.0, height=2.0)
    w = b.finalize(max_bodies=2, max_colliders=2, max_contacts=4)
    res = project_point(w, (0.0, 0.2, 0.0))
    assert bool(res["is_inside"])
    # 0.8 below the top cap is the nearest face.
    np.testing.assert_allclose(float(res["distance"]), -0.8, atol=1e-5)
