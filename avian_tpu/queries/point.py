"""Point queries: projection and containment
(``SpatialQuery::project_point`` / ``point_intersections``,
``system_param.rs:600-780``)."""

import jax
import jax.numpy as jnp

from avian_tpu.core.types import ShapeType
from avian_tpu.math import quat as quat_m
from avian_tpu.math import vec
from avian_tpu.pipeline.broadphase import update_collider_poses
from avian_tpu.queries.filter import QueryFilter, collider_query_mask

_BIG = 1e30


def _closest_local(p, shape_type, params):
    """(closest point, signed distance) in the collider's local frame."""
    # Sphere.
    r = params[0]
    d_sph = vec.length(p) - r
    c_sph = vec.normalize_or(p, jnp.asarray([1.0, 0.0, 0.0])) * r

    # Box.
    h = params[:3]
    q = jnp.clip(p, -h, h)
    outside = vec.length(p - q)
    face = h - jnp.abs(p)
    inside_d = -jnp.min(face)
    ax = jnp.argmin(face)
    sgn = jnp.where(p[ax] >= 0, 1.0, -1.0)
    q_in = p.at[ax].set(sgn * h[ax])
    is_out = outside > 0
    d_box = jnp.where(is_out, outside, inside_d)
    c_box = jnp.where(is_out, q, q_in)

    # Capsule.
    hh, cr = params[0], params[1]
    seg = jnp.asarray([0.0, 1.0, 0.0]) * jnp.clip(p[1], -hh, hh)
    delta = p - seg
    d_cap = vec.length(delta) - cr
    c_cap = seg + vec.normalize_or(delta, jnp.asarray([1.0, 0.0, 0.0])) * cr

    # Half-space.
    n = params[:3]
    dist = jnp.dot(p, n)
    d_pl = dist
    c_pl = p - n * dist

    st = shape_type
    d = jnp.select(
        [st == ShapeType.SPHERE, st == ShapeType.BOX,
         st == ShapeType.CAPSULE, st == ShapeType.PLANE],
        [d_sph, d_box, d_cap, d_pl],
        default=jnp.asarray(_BIG),
    )
    c = jnp.select(
        [(st == ShapeType.SPHERE), (st == ShapeType.BOX),
         (st == ShapeType.CAPSULE), (st == ShapeType.PLANE)],
        [c_sph, c_box, c_cap, c_pl],
        default=p,
    )
    return c, d


def project_point(world, point, solid=True, qfilter: QueryFilter = None):
    """(collider, body, point_on_collider, is_inside, distance) of the
    closest collider to ``point``."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    point = jnp.asarray(point, jnp.float32)
    col = world.colliders
    pos, quat = update_collider_poses(world)
    ok = collider_query_mask(col, qfilter)

    def one(p, q, st, prm):
        pl = quat_m.rotate_inv(q, point - p)
        c, d = _closest_local(pl, st, prm)
        return p + quat_m.rotate(q, c), d

    cpts, dists = jax.vmap(one)(pos, quat, col.shape_type, col.params)
    inside = dists < 0.0
    key = jnp.where(ok, jnp.where(inside & solid, 0.0, jnp.abs(dists)), _BIG)
    i = jnp.argmin(key)
    hit = key[i] < _BIG
    return {
        "collider": jnp.where(hit, i, -1).astype(jnp.int32),
        "body": jnp.where(hit, col.body_idx[i], -1).astype(jnp.int32),
        "point": jnp.where(inside[i] & solid, point, cpts[i]),
        "is_inside": inside[i] & hit,
        "distance": jnp.where(hit, dists[i], jnp.inf),
        "hit": hit,
    }


def point_intersections(world, point, max_hits: int = 8, qfilter: QueryFilter = None):
    """Indices of colliders containing ``point`` (padded with -1)."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    point = jnp.asarray(point, jnp.float32)
    col = world.colliders
    pos, quat = update_collider_poses(world)
    ok = collider_query_mask(col, qfilter)

    def one(p, q, st, prm):
        pl = quat_m.rotate_inv(q, point - p)
        _, d = _closest_local(pl, st, prm)
        return d

    dists = jax.vmap(one)(pos, quat, col.shape_type, col.params)
    contains = ok & (dists <= 0.0)
    score = jnp.where(contains, 1.0, 0.0)
    _, idx = jax.lax.top_k(score, max_hits)
    found = contains[idx]
    return jnp.where(found, idx, -1).astype(jnp.int32)
