"""Convex-hull colliders (vertex pools): resting stability + mass
properties (``Collider::convex_hull``, ``parry/mod.rs:704-1170``)."""

import jax
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.core.types import ShapeType
from avian_tpu.pipeline.step import rollout

CFG = PhysicsConfig(
    max_colors=4,
    shape_pairs=(
        (ShapeType.PLANE, ShapeType.CONVEX),
        (ShapeType.CONVEX, ShapeType.CONVEX),
        (ShapeType.BOX, ShapeType.CONVEX),
    ),
)


def _octahedron(r=0.6):
    return [
        (r, 0, 0), (-r, 0, 0), (0, r, 0), (0, -r, 0), (0, 0, r), (0, 0, -r),
    ]


def _cube_points(h=0.5):
    return [
        (sx * h, sy * h, sz * h)
        for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
    ]


def test_hull_mass_properties_match_box():
    """A hull of a cube's corners must get the analytic box mass/inertia."""
    b = SceneBuilder()
    body = b.add_body(pos=(0, 5, 0))
    b.convex_hull(body, _cube_points(0.5))
    b2 = SceneBuilder()
    body2 = b2.add_body(pos=(0, 5, 0))
    b2.box(body2, 0.5, 0.5, 0.5)
    w1 = b.finalize(max_bodies=2, max_colliders=2, max_contacts=8)
    w2 = b2.finalize(max_bodies=2, max_colliders=2, max_contacts=8)
    np.testing.assert_allclose(
        np.asarray(w1.bodies.inv_mass[body]),
        np.asarray(w2.bodies.inv_mass[body2]), rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(w1.bodies.inv_inertia[body]),
        np.asarray(w2.bodies.inv_inertia[body2]), rtol=1e-3, atol=1e-6,
    )


def test_hull_cube_rests_on_plane():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    body = b.add_body(pos=(0, 0.8, 0))
    b.convex_hull(body, _cube_points(0.5))
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    world = jax.jit(lambda w: rollout(w, CFG, 120))(world)
    pos = np.asarray(world.bodies.pos[body])
    assert np.isfinite(pos).all()
    assert abs(pos[1] - 0.5) < 0.02, pos
    assert bool(world.bodies.sleeping[body])


def test_hull_stack_and_octahedron():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    lower = b.add_body(pos=(0, 0.55, 0))
    b.convex_hull(lower, _cube_points(0.5))
    upper = b.add_body(pos=(0.05, 1.6, 0))
    b.convex_hull(upper, _cube_points(0.5))
    octa = b.add_body(pos=(3.0, 0.7, 0))
    b.convex_hull(octa, _octahedron(0.6))
    world = b.finalize(max_bodies=6, max_colliders=6, max_contacts=64)
    world = jax.jit(lambda w: rollout(w, CFG, 240))(world)
    pos = np.asarray(world.bodies.pos)
    assert np.isfinite(pos).all()
    # Hull-on-hull stack holds.
    assert abs(pos[lower][1] - 0.5) < 0.05
    assert abs(pos[upper][1] - 1.5) < 0.1
    # Octahedron settles onto a face (center height = distance from
    # centroid to a face plane of the regular octahedron = r/sqrt(3)).
    assert pos[octa][1] < 0.6 + 1e-3
    assert pos[octa][1] > 0.25
