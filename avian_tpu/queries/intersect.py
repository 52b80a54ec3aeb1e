"""Intersection queries (``SpatialQuery::aabb_intersections_with_aabb`` /
``shape_intersections``, ``system_param.rs:780-987``)."""

import jax
import jax.numpy as jnp

from avian_tpu.geometry.narrowphase import compute_manifold
from avian_tpu.math import quat as quat_m
from avian_tpu.pipeline.broadphase import update_collider_poses
from avian_tpu.queries.filter import QueryFilter, collider_query_mask
from avian_tpu.queries.shapecast import _cast_pairs


def aabb_intersections(world, aabb_min, aabb_max, max_hits: int = 8, qfilter=None):
    """Collider indices whose AABB overlaps the given AABB (padded -1)."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    col = world.colliders
    lo = jnp.asarray(aabb_min, jnp.float32)
    hi = jnp.asarray(aabb_max, jnp.float32)
    ok = collider_query_mask(col, qfilter) & jnp.all(
        (col.aabb_min <= hi[None, :]) & (lo[None, :] <= col.aabb_max), axis=-1
    )
    _, idx = jax.lax.top_k(jnp.where(ok, 1.0, 0.0), max_hits)
    return jnp.where(ok[idx], idx, -1).astype(jnp.int32)


def shape_intersections(
    world, shape_type, params, shape_pos, shape_quat,
    max_hits: int = 8, qfilter=None, shape_pairs=None,
):
    """Collider indices intersecting the given shape (padded -1)."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    pairs = _cast_pairs(world, int(shape_type), shape_pairs)
    col = world.colliders
    pos, quat = update_collider_poses(world)
    ok = collider_query_mask(col, qfilter)

    st = jnp.asarray(int(shape_type), jnp.int32)
    prm = jnp.zeros(8, jnp.float32).at[: len(params)].set(
        jnp.asarray(params, jnp.float32)
    )
    sp = jnp.asarray(shape_pos, jnp.float32)
    sq = jnp.asarray(shape_quat, jnp.float32)

    def one(ct, cp, cq, cprm):
        m = compute_manifold(
            st, sp, sq, prm, ct, cp, cq, cprm, shape_pairs=pairs,
            convex_verts=world.convex_verts,
            custom_shapes=world.custom_shapes,
        )
        overlapping = (m.count > 0) & (jnp.min(m.separation) < 0.0)
        return overlapping

    hits = jax.vmap(one)(col.shape_type, pos, quat, col.params) & ok
    _, idx = jax.lax.top_k(jnp.where(hits, 1.0, 0.0), max_hits)
    return jnp.where(hits[idx], idx, -1).astype(jnp.int32)
