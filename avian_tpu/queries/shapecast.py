"""Shape casting via conservative advancement
(``SpatialQuery::cast_shape``, ``system_param.rs:300-600``; the reference
delegates to Parry's ``cast_shapes``).

Fixed-iteration conservative advancement using the narrowphase manifold
functions for the distance/normal oracle: at parameter ``t`` the shapes'
minimum separation ``d(t)`` bounds how far we can safely advance along the
cast direction. Branch-free and vectorized over all colliders.
"""

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp

from avian_tpu.geometry.narrowphase import compute_manifold
from avian_tpu.math import vec
from avian_tpu.pipeline.broadphase import update_collider_poses
from avian_tpu.queries.filter import QueryFilter, collider_query_mask


def _cast_pairs(world, cast_type, override):
    """Canonical (cast shape x scene shapes) pair hint."""
    if override is not None:
        return override
    if world.shape_pairs is None:
        return None
    present = sorted({t for p in world.shape_pairs for t in p})
    return tuple(
        sorted({(min(cast_type, t), max(cast_type, t)) for t in present})
    )

_BIG = 1e30
_ITERS = 16
_EPS = 1e-4


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass(frozen=True)
class ShapeHit:
    """Mirrors ``ShapeHitData`` (shape_caster.rs)."""

    collider: jnp.ndarray  # i32[]
    body: jnp.ndarray      # i32[]
    distance: jnp.ndarray  # f32[] travel distance along the cast
    point_a: jnp.ndarray   # f32[3] witness on the cast shape at impact
    point_b: jnp.ndarray   # f32[3] witness on the hit collider
    normal: jnp.ndarray    # f32[3] surface normal on the hit collider
    hit: jnp.ndarray       # bool[]


def _sweep_all(
    world,
    shape_type,
    params,
    origin,
    rotation,
    direction,
    max_distance,
    qfilter: QueryFilter,
    shape_pairs,
):
    """Per-collider conservative advancement: one sweep of the scene.

    Returns ``(t, pa, pb, n)`` with ``t[i]`` the travel distance to
    collider ``i`` (``_BIG`` where filtered out or missed); both
    :func:`cast_shape` (argmin) and :func:`shape_hits` (top-k) are
    selections over this single sweep.
    """
    pairs = _cast_pairs(world, int(shape_type), shape_pairs)
    col = world.colliders
    pos, quat = update_collider_poses(world)
    ok = collider_query_mask(col, qfilter)

    st = jnp.asarray(int(shape_type), jnp.int32)
    prm = jnp.zeros(8, jnp.float32).at[: len(params)].set(
        jnp.asarray(params, jnp.float32)
    )
    o = jnp.asarray(origin, jnp.float32)
    rot = jnp.asarray(rotation, jnp.float32)
    d = vec.normalize_or(
        jnp.asarray(direction, jnp.float32), jnp.asarray([1.0, 0.0, 0.0])
    )

    def advance_one(ct, cp, cq, cprm):
        def body(_, state):
            t, done = state
            m = compute_manifold(
                st, o + d * t, rot, prm, ct, cp, cq, cprm,
                shape_pairs=pairs, convex_verts=world.convex_verts,
                custom_shapes=world.custom_shapes,
            )
            sep = jnp.min(m.separation)
            n = m.normal  # from cast shape toward collider
            approach = jnp.dot(d, n)  # >0 when moving toward the collider
            hit_now = sep < _EPS
            step = jnp.where(
                approach > 1e-6, sep / jnp.maximum(approach, 1e-6), _BIG
            )
            new_t = jnp.where(done | hit_now, t, t + jnp.maximum(step, 0.0))
            return jnp.minimum(new_t, max_distance + 1.0), done | hit_now

        t, hit = jax.lax.fori_loop(0, _ITERS, body, (jnp.asarray(0.0), jnp.asarray(False)))
        m = compute_manifold(
                st, o + d * t, rot, prm, ct, cp, cq, cprm,
                shape_pairs=pairs, convex_verts=world.convex_verts,
                custom_shapes=world.custom_shapes,
            )
        sep = jnp.min(m.separation)
        pi = jnp.argmin(m.separation)
        hit = hit & (t <= max_distance)
        return t, hit, m.point_a[pi], m.point_b[pi], m.normal

    t, hit, pa, pb, n = jax.vmap(advance_one)(
        col.shape_type, pos, quat, col.params
    )
    t = jnp.where(ok & hit, t, _BIG)
    return t, pa, pb, n


def cast_shape(
    world,
    shape_type,
    params,
    origin,
    rotation,
    direction,
    max_distance,
    qfilter: QueryFilter = None,
    shape_pairs=None,
) -> ShapeHit:
    """First hit when sweeping the shape from ``origin`` along
    ``direction`` (unit) up to ``max_distance``.

    ``shape_pairs``: optional static canonical pair hint (defaults to the
    world's own shape set x the cast shape) restricting which narrowphase
    branches are lowered."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    t, pa, pb, n = _sweep_all(
        world, shape_type, params, origin, rotation, direction,
        max_distance, qfilter, shape_pairs,
    )
    col = world.colliders
    i = jnp.argmin(t)
    found = t[i] < _BIG
    return ShapeHit(
        collider=jnp.where(found, i, -1).astype(jnp.int32),
        body=jnp.where(found, col.body_idx[i], -1).astype(jnp.int32),
        distance=jnp.where(found, t[i], jnp.inf),
        point_a=pa[i],
        point_b=pb[i],
        normal=-n[i],
        hit=found,
    )


def shape_hits(
    world,
    shape_type,
    params,
    origin,
    rotation,
    direction,
    max_distance,
    max_hits: int = 4,
    qfilter: QueryFilter = None,
    shape_pairs=None,
):
    """Up to ``max_hits`` hits along the sweep, nearest first
    (``SpatialQuery::shape_hits``, ``system_param.rs``): ONE scene sweep
    computes every collider's TOI; the ``max_hits`` nearest are read off
    with ``top_k`` (each collider hits at most once, so this equals the
    reference's exclude-and-recast loop at 1/max_hits the cost). Returns
    a batched :class:`ShapeHit` with a leading ``max_hits`` axis.
    """
    qfilter = qfilter if qfilter is not None else QueryFilter()
    t, pa, pb, n = _sweep_all(
        world, shape_type, params, origin, rotation, direction,
        max_distance, qfilter, shape_pairs,
    )
    col = world.colliders
    k = min(max_hits, col.capacity)
    neg_t, idx = jax.lax.top_k(-t, k)  # ascending travel distance
    tk = -neg_t
    found = tk < _BIG
    if k < max_hits:  # pad to the requested static width with misses
        pad = max_hits - k
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        tk = jnp.concatenate([tk, jnp.full((pad,), _BIG, tk.dtype)])
        found = jnp.concatenate([found, jnp.zeros((pad,), bool)])
    return ShapeHit(
        collider=jnp.where(found, idx, -1).astype(jnp.int32),
        body=jnp.where(found, col.body_idx[idx], -1).astype(jnp.int32),
        distance=jnp.where(found, tk, jnp.inf),
        point_a=pa[idx],
        point_b=pb[idx],
        normal=-n[idx],
        hit=found,
    )
