"""Predicate query variants (``SpatialQuery::cast_ray_predicate`` et al.,
``src/spatial_query/system_param.rs:8-12,194``).

The reference's predicate is a closure evaluated per candidate entity; the
TPU-native counterpart is a user function evaluated VECTORIZED over all
collider slots: ``predicate(world, collider_ids) -> bool[M]`` (True =
eligible). It runs once per query (inside jit, fused with the query), which
is the array-world equivalent of per-candidate evaluation.

Example::

    def not_glass(world, ids):
        return world.colliders.friction[ids] > 0.2   # any per-slot logic

    hit = cast_ray_predicate(world, origin, direction, not_glass)
"""

import jax.numpy as jnp

from avian_tpu.queries.filter import QueryFilter
from avian_tpu.queries.point import project_point
from avian_tpu.queries.raycast import cast_ray
from avian_tpu.queries.shapecast import cast_shape


def _with_predicate(world, qfilter, predicate):
    qfilter = qfilter if qfilter is not None else QueryFilter()
    ids = jnp.arange(world.colliders.capacity, dtype=jnp.int32)
    keep = jnp.asarray(predicate(world, ids), bool)
    excluded = jnp.broadcast_to(qfilter.excluded, keep.shape) | ~keep
    return QueryFilter(mask=qfilter.mask, excluded=excluded)


def cast_ray_predicate(
    world, origin, direction, predicate, max_distance=1e30, solid=True,
    qfilter: QueryFilter = None,
):
    """First ray hit among colliders passing ``predicate``
    (``system_param.rs:194`` ``cast_ray_predicate``)."""
    return cast_ray(
        world, origin, direction, max_distance, solid,
        _with_predicate(world, qfilter, predicate),
    )


def cast_shape_predicate(
    world, shape_type, params, origin, rotation, direction, predicate,
    max_distance=1e30, qfilter: QueryFilter = None, **kw,
):
    """First shape-cast hit among colliders passing ``predicate``
    (``cast_shape_predicate``)."""
    return cast_shape(
        world, shape_type, params, origin, rotation, direction,
        max_distance,
        qfilter=_with_predicate(world, qfilter, predicate), **kw,
    )


def project_point_predicate(
    world, point, predicate, solid=True, qfilter: QueryFilter = None
):
    """Closest point among colliders passing ``predicate``
    (``project_point_predicate``)."""
    return project_point(
        world, point, solid, _with_predicate(world, qfilter, predicate)
    )
