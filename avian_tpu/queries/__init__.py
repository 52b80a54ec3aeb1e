"""Spatial queries: raycasts, shape casts, point queries, intersections.

TPU-native counterpart of the reference's ``src/spatial_query/`` (the
``SpatialQuery`` system param, ``system_param.rs:128-987``). Instead of a
per-step BVH rebuild + recursive traversal (``pipeline.rs:97-120``), queries
test against all colliders brute-force vectorized — a [Q, M] masked
computation that the VPU eats for breakfast at small M — or, at scale,
against the uniform-grid cell list (``accel.build_query_grid`` +
``accel.cast_ray_grid``: branch-free 3D-DDA traversal, ~cells x window
tests per ray). Persistent ``RayCasters`` arrays mirror the reference's
``RayCaster`` components.
"""

from avian_tpu.queries.raycast import cast_ray, ray_hits, RayHit
from avian_tpu.queries.point import project_point, point_intersections
from avian_tpu.queries.intersect import (
    aabb_intersections,
    shape_intersections,
)
from avian_tpu.queries.shapecast import cast_shape, shape_hits, ShapeHit
from avian_tpu.queries.filter import QueryFilter
from avian_tpu.queries.predicate import (
    cast_ray_predicate,
    cast_shape_predicate,
    project_point_predicate,
)
from avian_tpu.queries.accel import (
    QueryGrid,
    RayCasters,
    ShapeCasters,
    build_query_grid,
    cast_ray_grid,
    update_ray_casters,
    update_shape_casters,
)

__all__ = [
    "cast_ray",
    "ray_hits",
    "RayHit",
    "project_point",
    "point_intersections",
    "aabb_intersections",
    "shape_intersections",
    "cast_shape",
    "shape_hits",
    "ShapeHit",
    "QueryFilter",
    "cast_ray_predicate",
    "cast_shape_predicate",
    "project_point_predicate",
    "QueryGrid",
    "RayCasters",
    "build_query_grid",
    "cast_ray_grid",
    "update_ray_casters",
    "ShapeCasters",
    "update_shape_casters",
]
