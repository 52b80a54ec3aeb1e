"""Raycasts against the collider set.

Counterpart of ``SpatialQuery::cast_ray`` / ``ray_hits``
(``system_param.rs:128-300``) and the ``RayCaster`` component
(``ray_caster.rs:78-140``). Per-shape intersection in the collider's local
frame; ``solid`` semantics match Parry: a ray starting inside a solid shape
hits at t=0 with the ray direction reversed as normal suppressed (we return
normal = -dir).
"""

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp

from avian_tpu.core.types import ShapeType
from avian_tpu.math import quat as quat_m
from avian_tpu.math import vec
from avian_tpu.pipeline.broadphase import update_collider_poses
from avian_tpu.queries.filter import QueryFilter, collider_query_mask

_BIG = 1e30


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass(frozen=True)
class RayHit:
    """Mirrors ``RayHitData`` (ray_caster.rs)."""

    collider: jnp.ndarray  # i32[] (or [...]) collider index, -1 = miss
    body: jnp.ndarray      # i32[]
    distance: jnp.ndarray  # f32[]
    point: jnp.ndarray     # f32[3]
    normal: jnp.ndarray    # f32[3]
    hit: jnp.ndarray       # bool[]


# --- per-shape ray tests in local frame ------------------------------------
# Each returns (t, normal_local); t = _BIG on miss. Ray: o + t*d, |d| = 1.


def _ray_sphere(o, d, params, solid):
    r = params[0]
    b = jnp.dot(o, d)
    c = jnp.dot(o, o) - r * r
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    inside = c < 0.0
    t = jnp.where(disc < 0.0, _BIG, jnp.where(t0 >= 0.0, t0, jnp.where(t1 >= 0.0, t1, _BIG)))
    t = jnp.where(inside & solid, 0.0, t)
    p = o + d * t
    n = vec.normalize_or(p, -d)
    n = jnp.where(inside & solid, -d, n)
    return t, n


def _ray_box(o, d, params, solid):
    h = params[:3]
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, jnp.where(d >= 0, 1e-12, -1e-12))
    t1 = (-h - o) * inv
    t2 = (h - o) * inv
    tmin3 = jnp.minimum(t1, t2)
    tmax3 = jnp.maximum(t1, t2)
    tmin = jnp.max(tmin3)
    tmax = jnp.min(tmax3)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    inside = (tmin < 0.0) & (tmax > 0.0)
    t = jnp.where(hit, jnp.where(inside, jnp.where(solid, 0.0, tmax), tmin), _BIG)
    # Normal: axis of tmin (or tmax when exiting).
    t_face = jnp.where(inside & ~solid, tmax, tmin)
    which = jnp.where(inside & ~solid, tmax3, tmin3)
    ax = jnp.argmax(jnp.where(which == t_face, 1.0, 0.0))
    sign = jnp.where((o + d * t)[ax] >= 0.0, 1.0, -1.0)
    n = jnp.zeros(3).at[ax].set(sign)
    n = jnp.where(inside & solid, -d, n)
    return t, n


def _ray_plane(o, d, params, solid):
    n = params[:3]
    denom = jnp.dot(d, n)
    dist = jnp.dot(o, n)
    t = jnp.where(jnp.abs(denom) > 1e-12, -dist / denom, _BIG)
    t = jnp.where(t >= 0.0, t, _BIG)
    # Inside the half space: solid hit at 0.
    t = jnp.where((dist < 0.0) & solid, 0.0, t)
    nrm = jnp.where(dist < 0.0, -n, n)
    nrm = jnp.where((dist < 0.0) & solid, -d, nrm)
    return t, nrm


def _ray_capsule(o, d, params, solid):
    hh, r = params[0], params[1]
    # Infinite cylinder about Y: (ox+t dx)^2 + (oz+t dz)^2 = r^2.
    oxz = jnp.asarray([o[0], 0.0, o[2]])
    dxz = jnp.asarray([d[0], 0.0, d[2]])
    a = jnp.dot(dxz, dxz)
    b = jnp.dot(oxz, dxz)
    c = jnp.dot(oxz, oxz) - r * r
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_cyl = jnp.where(
        (disc >= 0.0) & (a > 1e-12), (-b - sq) / jnp.maximum(a, 1e-12), _BIG
    )
    y_at = o[1] + d[1] * t_cyl
    cyl_ok = (t_cyl >= 0.0) & (jnp.abs(y_at) <= hh)
    t_cyl = jnp.where(cyl_ok, t_cyl, _BIG)

    # End caps: spheres at (0, +-hh, 0).
    t_top, n_top = _ray_sphere(o - jnp.asarray([0.0, 1.0, 0.0]) * hh, d, params[1:2], solid)
    t_bot, n_bot = _ray_sphere(o + jnp.asarray([0.0, 1.0, 0.0]) * hh, d, params[1:2], solid)

    t = jnp.minimum(t_cyl, jnp.minimum(t_top, t_bot))
    p = o + d * t
    n_cyl = vec.normalize_or(jnp.asarray([p[0], 0.0, p[2]]), -d)
    n = jnp.where(
        t == t_cyl, n_cyl, jnp.where(t == t_top, n_top, n_bot)
    )
    # Inside solid: distance to segment < r.
    ty = jnp.clip(o[1], -hh, hh)
    inside = vec.length_sq(o - jnp.asarray([0.0, 1.0, 0.0]) * ty) < r * r
    t = jnp.where(inside & solid, 0.0, t)
    n = jnp.where(inside & solid, -d, n)
    return t, n


def _ray_one_collider(o_w, d_w, pos, quat, shape_type, params, solid):
    """Ray vs one collider (world in, local test, world out)."""
    o = quat_m.rotate_inv(quat, o_w - pos)
    d = quat_m.rotate_inv(quat, d_w)
    branches = [
        lambda a: _ray_sphere(*a),
        lambda a: _ray_capsule(*a),
        lambda a: _ray_box(*a),
        lambda a: _ray_plane(*a),
    ]
    code = jnp.clip(shape_type, 0, 3)
    t, n_local = jax.lax.switch(code, branches, (o, d, params, solid))
    return t, quat_m.rotate(quat, n_local)


def _all_hits(world, origin, direction, solid, qfilter):
    col = world.colliders
    pos, quat = update_collider_poses(world)
    ok = collider_query_mask(col, qfilter)
    t, n = jax.vmap(
        lambda p, q, st, prm: _ray_one_collider(
            origin, direction, p, q, st, prm, solid
        )
    )(pos, quat, col.shape_type, col.params)
    t = jnp.where(ok, t, _BIG)
    return t, n


def cast_ray(
    world,
    origin,
    direction,
    max_distance=_BIG,
    solid=True,
    qfilter: QueryFilter = None,
) -> RayHit:
    """First hit along the ray (``SpatialQuery::cast_ray``)."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    origin = jnp.asarray(origin, jnp.float32)
    direction = vec.normalize_or(jnp.asarray(direction, jnp.float32), jnp.asarray([1.0, 0.0, 0.0]))
    t, n = _all_hits(world, origin, direction, solid, qfilter)
    t = jnp.where(t <= max_distance, t, _BIG)
    i = jnp.argmin(t)
    hit = t[i] < _BIG
    return RayHit(
        collider=jnp.where(hit, i, -1).astype(jnp.int32),
        body=jnp.where(hit, world.colliders.body_idx[i], -1).astype(jnp.int32),
        distance=jnp.where(hit, t[i], jnp.inf),
        point=origin + direction * jnp.where(hit, t[i], 0.0),
        normal=n[i],
        hit=hit,
    )


def ray_hits(
    world,
    origin,
    direction,
    max_hits: int,
    max_distance=_BIG,
    solid=True,
    qfilter: QueryFilter = None,
) -> RayHit:
    """Up to ``max_hits`` nearest hits, sorted by distance
    (``SpatialQuery::ray_hits``). Returns a RayHit with leading [max_hits]
    axis; misses padded with hit=False."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    origin = jnp.asarray(origin, jnp.float32)
    direction = vec.normalize_or(jnp.asarray(direction, jnp.float32), jnp.asarray([1.0, 0.0, 0.0]))
    t, n = _all_hits(world, origin, direction, solid, qfilter)
    t = jnp.where(t <= max_distance, t, _BIG)
    neg_t, idx = jax.lax.top_k(-t, max_hits)
    tk = -neg_t
    hit = tk < _BIG
    return RayHit(
        collider=jnp.where(hit, idx, -1).astype(jnp.int32),
        body=jnp.where(hit, world.colliders.body_idx[idx], -1).astype(jnp.int32),
        distance=jnp.where(hit, tk, jnp.inf),
        point=origin[None, :] + direction[None, :] * jnp.where(hit, tk, 0.0)[:, None],
        normal=n[idx],
        hit=hit,
    )
