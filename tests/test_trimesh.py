"""Trimesh / heightfield colliders: per-triangle pool-backed convex
colliders culled by the grid broadphase (replacing Parry's trimesh BVH
midphase, ``parry/mod.rs`` trimesh/heightfield constructors)."""

import jax
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.core.types import ShapeType
from avian_tpu.pipeline.step import rollout

CFG = PhysicsConfig(
    max_colors=4,
    shape_pairs=((ShapeType.SPHERE, ShapeType.CONVEX),
                 (ShapeType.BOX, ShapeType.CONVEX)),
)


def test_box_rests_on_triangulated_ramp():
    b = SceneBuilder()
    ground = b.add_body(body_type=BodyType.STATIC)
    # A shallow two-triangle ramp: quad from (-2,0,-2) to (2, 0.8, 2);
    # slope ~11.3 deg, friction 0.8 holds a box in place.
    v = [(-2, 0.0, -2), (2, 0.8, -2), (2, 0.8, 2), (-2, 0.0, 2)]
    b.trimesh(ground, v, [(0, 1, 2), (0, 2, 3)], friction=0.8)
    box = b.add_body(pos=(0.0, 2.0, 0.0))
    b.box(box, 0.3, 0.3, 0.3, friction=0.8)
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=32)
    world = jax.jit(lambda w: rollout(w, CFG, 180))(world)
    pos = np.asarray(world.bodies.pos[box])
    assert np.isfinite(pos).all()
    # Still near the drop point (friction holds) and a half-extent above
    # the inclined plane.
    assert abs(pos[0]) < 0.6 and abs(pos[2]) < 0.6, pos
    plane_y = 0.2 * (pos[0] + 2.0)
    clearance = (pos[1] - plane_y) * np.cos(np.arctan(0.2))
    assert 0.25 < clearance < 0.36, (pos, clearance)


def test_box_pile_on_heightfield():
    rng = np.random.default_rng(3)
    b = SceneBuilder()
    ground = b.add_body(body_type=BodyType.STATIC)
    hf = 0.3 * np.sin(np.linspace(0, 3, 6))[:, None] * np.cos(
        np.linspace(0, 3, 6)
    )[None, :]
    ids = b.heightfield(ground, hf, 10.0, 10.0)
    assert len(ids) == 50  # (6-1)*(6-1)*2 triangles
    boxes = []
    for k in range(4):
        body = b.add_body(pos=(-2.0 + 1.5 * k, 1.5, 0.3 * k - 0.5))
        b.box(body, 0.3, 0.3, 0.3)
        boxes.append(body)
    world = b.finalize(max_bodies=8, max_colliders=64, max_contacts=256)
    world = jax.jit(lambda w: rollout(w, CFG, 240))(world)
    pos = np.asarray(world.bodies.pos)[np.asarray(boxes)]
    assert np.isfinite(pos).all()
    # Nothing fell through the field (min height -0.3, box half 0.3).
    assert (pos[:, 1] > -0.4).all(), pos
    assert (np.abs(pos[:, 0]) < 6).all() and (np.abs(pos[:, 2]) < 6).all()


def test_voxel_terrain():
    """Voxel collider: surface-cell cubes (Collider::voxels analogue)."""
    b = SceneBuilder()
    ground = b.add_body(body_type=BodyType.STATIC, pos=(0, -0.5, 0))
    occ = np.ones((4, 1, 4), bool)  # a 4x1x4 slab of unit voxels
    ids = b.voxels(ground, occ, voxel_size=1.0, origin=(-2.0, 0.0, -2.0))
    assert len(ids) == 16
    ball = b.add_body(pos=(0.0, 2.0, 0.0))
    b.sphere(ball, 0.4)
    world = b.finalize(max_bodies=4, max_colliders=20, max_contacts=64)
    cfg = PhysicsConfig(max_colors=4, shape_pairs=((0, 2),))
    world = jax.jit(lambda w: rollout(w, cfg, 120))(world)
    y = float(world.bodies.pos[ball][1])
    # Slab spans y in [-0.5, 0.5]; ball rests on top at 0.5 + 0.4.
    assert abs(y - 0.9) < 0.02, y
