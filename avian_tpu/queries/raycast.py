"""Raycasts against the collider set.

Counterpart of ``SpatialQuery::cast_ray`` / ``ray_hits``
(``system_param.rs:128-300``) and the ``RayCaster`` component
(``ray_caster.rs:78-140``). Per-shape intersection in the collider's local
frame; ``solid`` semantics match Parry: a ray starting inside a solid shape
hits at t=0 with the ray direction reversed as normal suppressed (we return
normal = -dir).
"""

from dataclasses import dataclass, fields

import numpy as _np

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


def _ray_cylinder(o, d, params, solid):
    """Flat-capped cylinder about Y (half height, radius)."""
    hh, r = params[0], params[1]
    oxz = jnp.asarray([o[0], 0.0, o[2]])
    dxz = jnp.asarray([d[0], 0.0, d[2]])
    a = jnp.dot(dxz, dxz)
    b = jnp.dot(oxz, dxz)
    c = jnp.dot(oxz, oxz) - r * r
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_side = jnp.where(
        (disc >= 0.0) & (a > 1e-12), (-b - sq) / jnp.maximum(a, 1e-12), _BIG
    )
    y_at = o[1] + d[1] * t_side
    t_side = jnp.where(
        (t_side >= 0.0) & (jnp.abs(y_at) <= hh), t_side, _BIG
    )

    def cap(sy):
        denom = d[1]
        t = jnp.where(jnp.abs(denom) > 1e-12, (sy * hh - o[1]) / denom, _BIG)
        p = o + d * t
        ok = (t >= 0.0) & (p[0] * p[0] + p[2] * p[2] <= r * r)
        return jnp.where(ok, t, _BIG)

    t_top = cap(1.0)
    t_bot = cap(-1.0)
    t = jnp.minimum(t_side, jnp.minimum(t_top, t_bot))
    p = o + d * t
    n_side = vec.normalize_or(jnp.asarray([p[0], 0.0, p[2]]), -d)
    n = jnp.where(
        t == t_side,
        n_side,
        jnp.asarray([0.0, 1.0, 0.0]) * jnp.where(t == t_top, 1.0, -1.0),
    )
    inside = (jnp.abs(o[1]) <= hh) & (o[0] * o[0] + o[2] * o[2] < r * r)
    t = jnp.where(inside & solid, 0.0, t)
    n = jnp.where(inside & solid, -d, n)
    return t, n


def _ray_cone(o, d, params, solid):
    """Cone: base disc at y=-h (radius r), apex (0, +h, 0)."""
    hh, r = params[0], params[1]
    k = r / (2.0 * hh)
    A = d[0] * d[0] + d[2] * d[2] - k * k * d[1] * d[1]
    B = 2.0 * (o[0] * d[0] + o[2] * d[2]) + 2.0 * k * k * d[1] * (hh - o[1])
    C = o[0] * o[0] + o[2] * o[2] - k * k * (hh - o[1]) ** 2
    disc = B * B - 4.0 * A * C
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    safe_a = jnp.where(jnp.abs(A) > 1e-12, A, 1e-12)
    t0 = (-B - sq) / (2.0 * safe_a)
    t1 = (-B + sq) / (2.0 * safe_a)
    # Linear case (ray parallel to the slant).
    t_lin = jnp.where(jnp.abs(B) > 1e-12, -C / jnp.where(jnp.abs(B) > 1e-12, B, 1.0), _BIG)
    use_lin = jnp.abs(A) <= 1e-12

    def side_ok(t):
        y = o[1] + d[1] * t
        return (disc >= 0.0) & (t >= 0.0) & (y >= -hh) & (y <= hh)

    t0 = jnp.where(~use_lin & side_ok(t0), t0, _BIG)
    t1 = jnp.where(~use_lin & side_ok(t1), t1, _BIG)
    y_lin = o[1] + d[1] * t_lin
    t_lin = jnp.where(
        use_lin & (t_lin >= 0.0) & (y_lin >= -hh) & (y_lin <= hh), t_lin, _BIG
    )
    t_side = jnp.minimum(jnp.minimum(t0, t1), t_lin)

    denom = d[1]
    t_base = jnp.where(jnp.abs(denom) > 1e-12, (-hh - o[1]) / denom, _BIG)
    pb_ = o + d * t_base
    t_base = jnp.where(
        (t_base >= 0.0) & (pb_[0] * pb_[0] + pb_[2] * pb_[2] <= r * r),
        t_base,
        _BIG,
    )
    t = jnp.minimum(t_side, t_base)
    p = o + d * t
    n_side = vec.normalize_or(
        jnp.asarray([p[0], k * k * (hh - p[1]), p[2]]), -d
    )
    n = jnp.where(t == t_side, n_side, jnp.asarray([0.0, -1.0, 0.0]))
    r_at = k * (hh - o[1])
    inside = (
        (o[1] >= -hh) & (o[1] <= hh)
        & (o[0] * o[0] + o[2] * o[2] < r_at * r_at)
    )
    t = jnp.where(inside & solid, 0.0, t)
    n = jnp.where(inside & solid, -d, n)
    return t, n


def _ray_convex(o, d, params, solid, pool):
    """Sphere tracing against the hull's support map: the point-to-hull
    distance (Frank-Wolfe) is a safe marching bound along any ray.
    ``params[6]`` is the round radius (round_cuboid etc.): the traced
    surface is the inner hull inflated by it."""
    from avian_tpu.geometry.convex import MAX_HULL_VERTS

    rr = params[6]
    off = params[0].astype(jnp.int32)
    cnt = params[1].astype(jnp.int32)
    verts = jax.lax.dynamic_slice(pool, (off, 0), (MAX_HULL_VERTS, 3))
    valid = jnp.arange(MAX_HULL_VERTS) < cnt

    def closest(p):
        # FW on min |x - p|^2 over the hull.
        x = jnp.where(valid[:, None], verts, verts[0:1]).mean(axis=0)

        def body(x, _):
            g = x - p
            dots = jnp.where(valid, verts @ (-g), -1e30)
            sball = verts[jnp.argmax(dots)]
            dxs = x - sball
            gamma = jnp.clip(
                jnp.dot(g, dxs) / jnp.maximum(jnp.dot(dxs, dxs), 1e-12),
                0.0, 1.0,
            )
            return x - gamma * dxs, None

        x, _ = jax.lax.scan(body, x, None, length=12)
        return x

    def sigma(u):
        return jnp.max(jnp.where(valid, verts @ u, -1e30))

    def march(carry, _):
        t, done, n_last = carry
        p = o + d * t
        x = closest(p)
        u = vec.normalize_or(p - x, -d)
        # Support-plane LOWER bound of the distance (FW gives an upper
        # bound — marching with it would overshoot into the hull).
        lb = jnp.dot(u, p) - sigma(u) - rr
        hit = lb < 1e-4
        t_new = jnp.where(done | hit, t, t + jnp.maximum(lb, 1e-5))
        n_last = jnp.where(done, n_last, u)
        return (jnp.minimum(t_new, 1e6), done | hit, n_last), None

    (t, hit, n), _ = jax.lax.scan(
        march,
        (jnp.asarray(0.0), jnp.asarray(False), -d),
        None,
        length=24,
    )
    # Fit the actual face plane: collect the support ring along n and take
    # its plane normal (the marching direction converges only to a few
    # degrees; the ring fit is exact for flat faces).
    size = jnp.maximum(jnp.max(params[2:5]), 1e-3)
    dots_n = jnp.where(valid, verts @ n, -1e30)
    near = valid & (dots_n > jnp.max(dots_n) - 0.35 * size)
    k_near = jnp.sum(near.astype(jnp.int32))
    c_near = jnp.sum(
        jnp.where(near[:, None], verts, 0.0), axis=0
    ) / jnp.maximum(k_near.astype(jnp.float32), 1.0)
    rel = jnp.where(near[:, None], verts - c_near, 0.0)
    i_a = jnp.argmax(jnp.sum(rel * rel, axis=-1))
    cr = jnp.cross(rel[i_a][None, :], rel)
    i_b = jnp.argmax(jnp.sum(cr * cr, axis=-1))
    nf = vec.normalize_or(jnp.cross(rel[i_a], rel[i_b]), n)
    nf = nf * jnp.sign(jnp.dot(nf, n) + 1e-12)
    n = jnp.where(k_near >= 3, nf, n)

    # One exact refinement: intersect the ray with the support plane of
    # the fitted face normal.
    dn = jnp.dot(d, n)
    t_ref = (sigma(n) + rr - jnp.dot(n, o)) / jnp.where(
        jnp.abs(dn) > 1e-9, dn, 1e-9
    )
    t = jnp.where(
        (jnp.abs(dn) > 1e-6) & (jnp.abs(t_ref - t) < 0.1) & (t_ref >= 0.0),
        t_ref,
        t,
    )
    t = jnp.where(hit, t, _BIG)
    inside = vec.length(closest(o) - o) < rr + 1e-6
    t = jnp.where(inside & solid, 0.0, t)
    n = jnp.where(inside & solid, -d, n)
    return t, n


def _ray_miss(o, d, params, solid):
    return jnp.asarray(_BIG), -d


def _ray_support(o, d, params, solid, support):
    """Ray vs an arbitrary support-mapped shape (user ``CustomShape``):
    sphere tracing with the support-plane LOWER bound, like
    ``_ray_convex`` but with the support function as the only oracle.
    The closest point comes from Frank-Wolfe with ``support(-grad)`` as
    the linear-minimization step; the hit normal is the final
    closest-point direction (exact at convergence for smooth shapes)."""

    def closest(p):
        x = support(params, d)

        def body(x, _):
            g = x - p
            sball = support(params, -g)
            dxs = x - sball
            gamma = jnp.clip(
                jnp.dot(g, dxs) / jnp.maximum(jnp.dot(dxs, dxs), 1e-12),
                0.0, 1.0,
            )
            return x - gamma * dxs, None

        x, _ = jax.lax.scan(body, x, None, length=12)
        return x

    def march(carry, _):
        t, done, n_last = carry
        p = o + d * t
        x = closest(p)
        u = vec.normalize_or(p - x, -d)
        lb = jnp.dot(u, p) - jnp.dot(support(params, u), u)
        hit = lb < 1e-4
        t_new = jnp.where(done | hit, t, t + jnp.maximum(lb, 1e-5))
        n_last = jnp.where(done, n_last, u)
        return (jnp.minimum(t_new, 1e6), done | hit, n_last), None

    (t, hit, n), _ = jax.lax.scan(
        march,
        (jnp.asarray(0.0), jnp.asarray(False), -d),
        None,
        length=24,
    )
    t = jnp.where(hit, t, _BIG)
    inside = vec.length(closest(o) - o) < 1e-6
    t = jnp.where(inside & solid, 0.0, t)
    n = jnp.where(inside & solid, -d, n)
    return t, n


def _ray_one_collider(o_w, d_w, pos, quat, shape_type, params, solid,
                      pool=None, custom_shapes=()):
    """Ray vs one collider (world in, local test, world out)."""
    o = quat_m.rotate_inv(quat, o_w - pos)
    d = quat_m.rotate_inv(quat, d_w)
    # Only lower the (expensive, sphere-traced) convex branch when the
    # scene actually has hulls — under vmap, lax.switch evaluates every
    # branch for every lane. Pool size is static, so this is trace-time.
    has_convex = pool is not None and pool.shape[0] > 1
    if pool is None:
        pool = jnp.zeros((1, 3), jnp.float32)
    from avian_tpu.geometry.convex import MAX_HULL_VERTS

    pool = jnp.concatenate(
        [pool, jnp.zeros((MAX_HULL_VERTS, 3), jnp.float32)], axis=0
    )
    branches = [
        lambda a: _ray_sphere(*a),
        lambda a: _ray_capsule(*a),
        lambda a: _ray_box(*a),
        lambda a: _ray_plane(*a),
        lambda a: _ray_cylinder(*a),
        lambda a: _ray_cone(*a),
        lambda a: _ray_miss(*a),   # segment
        lambda a: _ray_miss(*a),   # triangle
        (lambda a: _ray_convex(*a, pool)) if has_convex
        else (lambda a: _ray_miss(*a)),
    ]
    if custom_shapes:
        from avian_tpu.api.custom_shapes import CUSTOM_SHAPE_BASE

        for cs in custom_shapes:
            branches.append(
                lambda a, s=cs.support: _ray_support(*a, s)
            )
        # Map runtime codes to branch indices: built-ins identity,
        # CUSTOM_SHAPE_BASE + i -> 9 + i, gaps -> the segment miss branch.
        lut = _np.full(CUSTOM_SHAPE_BASE + len(custom_shapes), 6, _np.int32)
        lut[:9] = _np.arange(9)
        lut[CUSTOM_SHAPE_BASE:] = 9 + _np.arange(len(custom_shapes))
        code = jnp.asarray(lut)[
            jnp.clip(shape_type, 0, lut.shape[0] - 1)
        ]
    else:
        code = jnp.clip(shape_type, 0, 8)
    t, n_local = jax.lax.switch(code, branches, (o, d, params, solid))
    return t, quat_m.rotate(quat, n_local)


def _all_hits(world, origin, direction, solid, qfilter):
    col = world.colliders
    pos, quat = update_collider_poses(world)
    ok = collider_query_mask(col, qfilter)
    t, n = jax.vmap(
        lambda p, q, st, prm: _ray_one_collider(
            origin, direction, p, q, st, prm, solid,
            pool=world.convex_verts,
            custom_shapes=world.custom_shapes,
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
