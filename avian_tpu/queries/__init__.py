"""Spatial queries: raycasts, shape casts, point queries, intersections.

TPU-native counterpart of the reference's ``src/spatial_query/`` (the
``SpatialQuery`` system param, ``system_param.rs:128-987``). Instead of a
per-step BVH rebuild + recursive traversal (``pipeline.rs:97-120``), queries
test against all colliders brute-force vectorized — a [Q, M] masked
computation that the VPU eats for breakfast at the scales where the
reference uses a tree. A broadphase-reusing pruned variant is a later
optimization.
"""

from avian_tpu.queries.raycast import cast_ray, ray_hits, RayHit
from avian_tpu.queries.point import project_point, point_intersections
from avian_tpu.queries.intersect import (
    aabb_intersections,
    shape_intersections,
)
from avian_tpu.queries.shapecast import cast_shape, ShapeHit
from avian_tpu.queries.filter import QueryFilter

__all__ = [
    "cast_ray",
    "ray_hits",
    "RayHit",
    "project_point",
    "point_intersections",
    "aabb_intersections",
    "shape_intersections",
    "cast_shape",
    "ShapeHit",
    "QueryFilter",
]
