"""Dedicated 2D fast path: [N, 2] positions, scalar rotations.

The TPU-native counterpart of the reference's ``avian2d`` crate (the same
``src/`` compiled with ``dim2`` features): instead of running 2D scenes
through the 3D pipeline with locked axes (which pays full 3D cost —
quaternions, 3x3 inertia, 3D manifolds), this package implements the
pipeline on a dedicated 2D profile:

- bodies: pos f32[N, 2], angle f32[N], scalar angular velocity/inertia;
- every collider is a ROUNDED CONVEX POLYGON (<= 8 vertices + radius), the
  Box2D-v3 unification the reference's solver design descends from:
  circle = 1 vertex + radius, capsule = 2 vertices + radius, segment =
  2 vertices, rectangle = 4 vertices, round_rectangle = 4 + radius,
  regular_polygon / convex hull = k vertices, ellipse = inscribed 8-gon
  (documented approximation), half_space = dedicated plane type;
- ONE narrowphase kernel (rounded-polygon vs rounded-polygon SAT + clip,
  <= 2-point manifolds like the reference's 2D ``ContactManifold``) covers
  every shape pair;
- the TGS-soft solver, grid broadphase, persistent contacts with
  warm-start matching, XPBD joints, islands/sleeping mirror the 3D
  modules' design with scalar rotations.

Shape coverage closes the reference's 2D collider set
(``src/collision/collider/parry/mod.rs:737-859``): circle, ellipse,
rectangle, round_rectangle, capsule, segment, triangle, regular_polygon,
convex_polyline/convex_hull, half_space (polyline/trimesh = many segment
colliders, compound = multiple colliders per body).
"""

from avian_tpu.dim2.builder import SceneBuilder2D
from avian_tpu.dim2.state import Bodies2D, Colliders2D, Contacts2D, Joints2D, World2D
from avian_tpu.dim2.step import physics_step_2d, rollout_2d
from avian_tpu.dim2 import queries

__all__ = [
    "SceneBuilder2D",
    "Bodies2D",
    "Colliders2D",
    "Contacts2D",
    "Joints2D",
    "World2D",
    "physics_step_2d",
    "rollout_2d",
    "queries",
]
