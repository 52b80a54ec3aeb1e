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


def _closest_local(p, shape_type, params, pool=None, custom_shapes=()):
    """(closest point, signed distance) in the collider's local frame.

    Covers every collider shape. CONVEX (incl. round hulls) uses the
    Frank-Wolfe closest-point map; a point inside the inner hull reports
    ``-round_radius`` (a penetration lower bound) since vertex pools carry
    no face planes for an exact interior distance."""
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

    # Cylinder (axis Y): 2D analysis in the (radial, y) half-plane.
    ch2, crr = params[0], params[1]
    rho = jnp.sqrt(p[0] * p[0] + p[2] * p[2])
    u_rad = vec.normalize_or(
        jnp.asarray([1.0, 0.0, 1.0]) * p, jnp.asarray([1.0, 0.0, 0.0])
    )
    yc = jnp.clip(p[1], -ch2, ch2)
    rc = jnp.minimum(rho, crr)
    q_out = u_rad * rc + jnp.asarray([0.0, 1.0, 0.0]) * yc
    out_cyl = (rho > crr) | (jnp.abs(p[1]) > ch2)
    d_side = crr - rho
    d_capf = ch2 - jnp.abs(p[1])
    sgn_y = jnp.where(p[1] >= 0, 1.0, -1.0)
    q_in_cyl = jnp.where(
        d_side < d_capf,
        u_rad * crr + jnp.asarray([0.0, 1.0, 0.0]) * p[1],
        jnp.asarray([p[0], sgn_y * ch2, p[2]]),
    )
    d_cyl = jnp.where(
        out_cyl, vec.length(p - q_out), -jnp.minimum(d_side, d_capf)
    )
    c_cyl = jnp.where(out_cyl, q_out, q_in_cyl)

    # Cone (axis Y, apex +h): closest of the slant and base segments in
    # the (radial, y) half-plane.
    def _seg2(a, b):
        ab = b - a
        t = jnp.clip(
            jnp.dot(jnp.asarray([rho, p[1]]) - a, ab)
            / jnp.maximum(jnp.dot(ab, ab), 1e-12),
            0.0, 1.0,
        )
        return a + t * ab

    apex = jnp.asarray([0.0, ch2])
    base_rim = jnp.asarray([crr, -ch2])
    base_ctr = jnp.asarray([0.0, -ch2])
    q_sl = _seg2(apex, base_rim)
    q_ba = _seg2(base_ctr, base_rim)
    p2 = jnp.asarray([rho, p[1]])
    pick_sl = vec.length(p2 - q_sl) < vec.length(p2 - q_ba)
    q2 = jnp.where(pick_sl, q_sl, q_ba)
    d2 = jnp.minimum(vec.length(p2 - q_sl), vec.length(p2 - q_ba))
    inside_cone = (
        (p[1] >= -ch2)
        & (p[1] <= ch2)
        & (rho <= crr * (ch2 - p[1]) / jnp.maximum(2.0 * ch2, 1e-9))
    )
    d_cone = jnp.where(inside_cone, -d2, d2)
    c_cone = u_rad * q2[0] + jnp.asarray([0.0, 1.0, 0.0]) * q2[1]

    # Segment (on local X, half-length params[0]): never "inside".
    q_seg = jnp.asarray([jnp.clip(p[0], -params[0], params[0]), 0.0, 0.0])
    d_seg = vec.length(p - q_seg)

    # Convex hull (+ round radius in lane 6).
    if pool is not None:
        from avian_tpu.geometry import convex as _cx

        x_h = _cx.closest_point_on_hull(params, p, pool)
        delta_h = p - x_h
        dd = vec.length(delta_h)
        rr = params[6]
        u_h = vec.normalize_or(delta_h, jnp.asarray([1.0, 0.0, 0.0]))
        d_cvx = dd - rr
        c_cvx = jnp.where(dd > 1e-6, x_h + u_h * rr, p)
    else:
        d_cvx = jnp.asarray(_BIG)
        c_cvx = p

    st = shape_type
    conds = [
        st == ShapeType.SPHERE, st == ShapeType.BOX,
        st == ShapeType.CAPSULE, st == ShapeType.PLANE,
        st == ShapeType.CYLINDER, st == ShapeType.CONE,
        st == ShapeType.SEGMENT, st == ShapeType.CONVEX,
    ]
    d_vals = [d_sph, d_box, d_cap, d_pl, d_cyl, d_cone, d_seg, d_cvx]
    c_vals = [c_sph, c_box, c_cap, c_pl, c_cyl, c_cone, q_seg, c_cvx]

    # User CustomShapes: Frank-Wolfe closest point on the support map;
    # inside -> subgradient minimum-overlap depth (both from
    # geometry/convex.py, the same oracles the narrowphase uses).
    if custom_shapes:
        from avian_tpu.api.custom_shapes import CUSTOM_SHAPE_BASE
        from avian_tpu.geometry import convex as _cx

        for i, cs in enumerate(custom_shapes):
            sup = cs.support

            def sk(u, sup=sup):
                return sup(params, u) - p

            x = _cx._fw_distance(
                sk, sup(params, jnp.asarray([1.0, 0.0, 0.0])) - p
            )
            dist = vec.length(x)
            u_pen, depth = _cx._depth_direction(
                sk, vec.normalize_or(-x, jnp.asarray([0.0, 1.0, 0.0]))
            )
            inside_c = dist < 1e-5
            conds.append(st == CUSTOM_SHAPE_BASE + i)
            d_vals.append(jnp.where(inside_c, -depth, dist))
            c_vals.append(
                jnp.where(inside_c, p + u_pen * depth, p + x)
            )

    d = jnp.select(conds, d_vals, default=jnp.asarray(_BIG))
    c = jnp.select(conds, c_vals, default=p)
    return c, d


def project_point(world, point, solid=True, qfilter: QueryFilter = None):
    """(collider, body, point_on_collider, is_inside, distance) of the
    closest collider to ``point``."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    point = jnp.asarray(point, jnp.float32)
    col = world.colliders
    pos, quat = update_collider_poses(world)
    ok = collider_query_mask(col, qfilter)

    pool = world.convex_verts if world.convex_verts.shape[0] > 1 else None

    def one(p, q, st, prm):
        pl = quat_m.rotate_inv(q, point - p)
        c, d = _closest_local(pl, st, prm, pool, world.custom_shapes)
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

    pool = world.convex_verts if world.convex_verts.shape[0] > 1 else None

    def one(p, q, st, prm):
        pl = quat_m.rotate_inv(q, point - p)
        _, d = _closest_local(pl, st, prm, pool, world.custom_shapes)
        return d

    dists = jax.vmap(one)(pos, quat, col.shape_type, col.params)
    contains = ok & (dists <= 0.0)
    score = jnp.where(contains, 1.0, 0.0)
    k = min(max_hits, score.shape[0])  # worlds smaller than max_hits
    _, idx = jax.lax.top_k(score, k)
    found = contains[idx]
    out = jnp.where(found, idx, -1).astype(jnp.int32)
    if k < max_hits:
        out = jnp.concatenate(
            [out, jnp.full((max_hits - k,), -1, jnp.int32)]
        )
    return out
