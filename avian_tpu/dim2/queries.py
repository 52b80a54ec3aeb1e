"""2D spatial queries: the reference's full ``SpatialQuery`` surface on the
dedicated [N,2] profile (``avian2d``'s ``src/spatial_query/system_param.rs``
compiled with ``dim2`` features; same method set as the 3D module
``avian_tpu/queries/``).

Every 2D collider is a rounded convex polygon (<= 8 vertices + radius) or a
half-space, so ONE kernel family covers every shape:

- **ray cast** — exact, branch-free: the offset shape (Minkowski sum of the
  core polygon with a disk) is the union of three convex-set families —
  the core polygon, one rectangle per edge (edge swept outward by the
  radius), and one disk per vertex. The union is convex, so the ray-shape
  interval is ``[min over set entries, max over set exits]``; the entering
  feature supplies the exact surface normal. Degenerate families vanish
  naturally (radius 0 -> disks/rectangles never win; count < 3 -> no core),
  which makes circles, capsules, segments and sharp polygons all the same
  code path.
- **point projection** — closest point on the core boundary
  (:func:`~avian_tpu.dim2.narrowphase._closest_on_poly`) pushed out along
  the distance-field gradient by the radius.
- **shape cast** — conservative advancement driven by the pair manifold
  kernel (:func:`~avian_tpu.dim2.narrowphase.compute_manifold_2d`), exactly
  like the 3D ``queries/shapecast.py``. SAT separation lower-bounds the true
  distance in vertex-vertex configurations, so advancement stays
  conservative and converges within the fixed iteration budget.

Filters reuse the 3D :class:`~avian_tpu.queries.filter.QueryFilter`
(layer mask + excluded mask, ``query_filter.rs`` semantics); predicate
variants (``cast_ray_predicate`` etc., ``system_param.rs:194``) fold a user
mask function into the filter.
"""

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp
import numpy as np

from avian_tpu.dim2.broadphase import update_collider_poses
from avian_tpu.dim2.narrowphase import (
    _closest_on_poly,
    _normalize,
    _perp,
    compute_manifold_2d,
    rot,
    rotate,
)
from avian_tpu.dim2.state import MAX_POLY_VERTS, World2D
from avian_tpu.queries.filter import QueryFilter, collider_query_mask

_BIG = 1e30
_EPS = 1e-4
_CAST_ITERS = 24


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


# ---------------------------------------------------------------------------
# Query shapes (host-side constructors; counterpart of passing a Collider
# to ``SpatialQuery::cast_shape``)
# ---------------------------------------------------------------------------


def shape_circle(radius):
    """(verts, count, radius) triple for a circle query shape."""
    return (
        jnp.zeros((MAX_POLY_VERTS, 2), jnp.float32),
        jnp.asarray(1, jnp.int32),
        jnp.asarray(radius, jnp.float32),
    )


def shape_capsule(radius, length, axis=(0.0, 1.0)):
    """Capsule of total segment ``length`` along ``axis``."""
    a = np.asarray(axis, np.float32)
    a = a / max(float(np.linalg.norm(a)), 1e-9)
    h = 0.5 * float(length)
    v = np.zeros((MAX_POLY_VERTS, 2), np.float32)
    v[0] = -h * a
    v[1:] = h * a  # padding duplicates the last vertex
    return (
        jnp.asarray(v),
        jnp.asarray(2, jnp.int32),
        jnp.asarray(radius, jnp.float32),
    )


def shape_polygon(points, radius=0.0):
    """Convex polygon query shape from CCW (or CW; rewound) points."""
    pts = np.asarray(points, np.float32)
    if pts.shape[0] > MAX_POLY_VERTS:
        raise ValueError(
            f"2D query shapes support <= {MAX_POLY_VERTS} vertices"
        )
    # Ensure CCW winding (outward normals) like the builder.
    area2 = 0.0
    for i in range(pts.shape[0]):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % pts.shape[0]]
        area2 += x0 * y1 - x1 * y0
    if area2 < 0.0:
        pts = pts[::-1].copy()
    v = np.zeros((MAX_POLY_VERTS, 2), np.float32)
    v[: pts.shape[0]] = pts
    v[pts.shape[0]:] = pts[-1]
    return (
        jnp.asarray(v),
        jnp.asarray(pts.shape[0], jnp.int32),
        jnp.asarray(radius, jnp.float32),
    )


def shape_rect(hx, hy, radius=0.0):
    """Rectangle (half-extents) query shape; ``radius`` rounds the corners."""
    return shape_polygon(
        [(-hx, -hy), (hx, -hy), (hx, hy), (-hx, hy)], radius
    )


# ---------------------------------------------------------------------------
# Ray vs one rounded polygon / half-space (exact)
# ---------------------------------------------------------------------------


@_register
@dataclass(frozen=True)
class RayHit2D:
    """Mirrors ``RayHitData`` (``ray_caster.rs``) on the 2D profile."""

    collider: jnp.ndarray  # i32[]
    body: jnp.ndarray      # i32[]
    distance: jnp.ndarray  # f32[]
    point: jnp.ndarray     # f32[2]
    normal: jnp.ndarray    # f32[2] outward surface normal at the hit
    hit: jnp.ndarray       # bool[]


def _slab(o, d, plane_n, plane_p, valid):
    """Enter/exit bounds of a convex region given face half-planes.

    ``plane_n`` [K,2] outward normals, ``plane_p`` [K,2] points on each
    face, ``valid`` bool[K]. Returns (enter_t, exit_t, enter_normal, ok).
    """
    denom = jnp.sum(plane_n * d[None, :], axis=-1)            # [K]
    num = jnp.sum(plane_n * (plane_p - o[None, :]), axis=-1)  # [K]
    t = num / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    entering = valid & (denom < -1e-12)
    exiting = valid & (denom > 1e-12)
    # Parallel ray outside a face -> the region is never entered.
    parallel_out = valid & (jnp.abs(denom) <= 1e-12) & (num < 0.0)
    t_enter_all = jnp.where(entering, t, -_BIG)
    e = jnp.max(t_enter_all, initial=-_BIG)
    x = jnp.min(jnp.where(exiting, t, _BIG), initial=_BIG)
    ok = (e <= x + 1e-9) & ~jnp.any(parallel_out) & jnp.any(valid)
    n_enter = plane_n[jnp.argmax(t_enter_all)]
    return e, x, n_enter, ok


def _ray_rounded_poly(o, d, verts_w, count, radius, is_plane, plane_n_w,
                      plane_p_w, solid):
    """Exact first-hit of a ray against one world-space rounded polygon
    (or half-space). Returns (t, normal); t = _BIG on miss."""
    idx = jnp.arange(MAX_POLY_VERTS)
    nxt = jnp.where(idx + 1 < count, idx + 1, 0)
    v0 = verts_w                       # [V,2]
    v1 = verts_w[nxt]                  # [V,2]
    e = v1 - v0
    elen = jnp.linalg.norm(e, axis=-1)
    edge_ok = (idx < count) & (count >= 2) & (elen > 1e-9)
    n_out = _normalize(_perp(e))       # outward for CCW

    # --- set 1: core polygon (count >= 3) -------------------------------
    core_valid_faces = (idx < count) & (count >= 3) & (elen > 1e-9)
    e_core, x_core, n_core, ok_core = _slab(
        o, d, n_out, v0, core_valid_faces
    )
    ok_core = ok_core & (count >= 3)

    # --- set 2: vertex disks ---------------------------------------------
    oc = o[None, :] - v0                                  # [V,2]
    b = jnp.sum(oc * d[None, :], axis=-1)                 # d unit
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - c
    disk_ok = (idx < count) & (disc >= 0.0) & (radius > 1e-12)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    e_disk = -b - sq
    x_disk = -b + sq
    n_disk_in = _normalize(o[None, :] + e_disk[:, None] * d[None, :] - v0)

    # --- set 3: edge rectangles (edge swept outward by radius) -----------
    # radius 0 keeps the rectangles: the slab degenerates to the exact
    # thin-segment crossing test (enter == exit at the crossing t).
    t_hat = e / jnp.maximum(elen, 1e-9)[:, None]
    rect_ok = edge_ok
    # 4 half-planes per edge: outer face (n, v0 + r n), inner (-n, v0),
    # caps (-t, v0) and (t, v1).
    def rect_slab(i):
        pn = jnp.stack([n_out[i], -n_out[i], -t_hat[i], t_hat[i]])
        pp = jnp.stack(
            [v0[i] + radius * n_out[i], v0[i], v0[i], v1[i]]
        )
        return _slab(o, d, pn, pp, jnp.ones((4,), bool))

    e_rect, x_rect, n_rect, ok_rect = jax.vmap(rect_slab)(idx)
    ok_rect = ok_rect & rect_ok

    # --- union (convex) ---------------------------------------------------
    enters = jnp.concatenate(
        [e_core[None], jnp.where(disk_ok, e_disk, _BIG),
         jnp.where(ok_rect, e_rect, _BIG)]
    )
    exits = jnp.concatenate(
        [x_core[None], jnp.where(disk_ok, x_disk, -_BIG),
         jnp.where(ok_rect, x_rect, -_BIG)]
    )
    normals_in = jnp.concatenate(
        [n_core[None], n_disk_in, n_rect], axis=0
    )
    valid = jnp.concatenate([ok_core[None], disk_ok, ok_rect])

    any_valid = jnp.any(valid)
    t_in_all = jnp.where(valid, enters, _BIG)
    t_in = jnp.min(t_in_all)
    t_out = jnp.max(jnp.where(valid, exits, -_BIG))
    k_in = jnp.argmin(t_in_all)
    n_in = normals_in[k_in]
    # Exit feature normal: outward normal at the exit point (disk normal
    # recomputed at t_out; faces keep their plane normal).
    exit_pt = o + t_out * d
    n_out_exit = _normalize(
        exit_pt - v0[jnp.argmax(jnp.where(disk_ok, x_disk, -_BIG))]
    )
    # For polygon/rect exits a cheap, always-valid outward normal is the
    # face normal whose plane the exit point lies on; approximate with the
    # deepest face at the exit point (exact for core/rect exits).
    face_d_exit = jnp.sum(n_out * (exit_pt[None, :] - v0), axis=-1)
    face_d_exit = jnp.where(core_valid_faces | edge_ok, face_d_exit, -_BIG)
    n_face_exit = n_out[jnp.argmax(face_d_exit)]
    disk_exit_wins = jnp.max(jnp.where(disk_ok, x_disk, -_BIG)) >= t_out - 1e-6
    n_exit = jnp.where(disk_exit_wins & (radius > 1e-12), n_out_exit,
                       n_face_exit)

    inside = any_valid & (t_in <= 0.0) & (t_out >= 0.0)
    hit_front = any_valid & (t_in >= 0.0)

    t_solid = jnp.where(inside, 0.0, jnp.where(hit_front, t_in, _BIG))
    n_solid = jnp.where(inside, -d, n_in)
    t_hollow = jnp.where(
        inside, jnp.where(t_out >= 0.0, t_out, _BIG),
        jnp.where(hit_front, t_in, _BIG),
    )
    n_hollow = jnp.where(inside, n_exit, n_in)

    t_poly = jnp.where(solid, t_solid, t_hollow)
    n_poly = jnp.where(solid, n_solid, n_hollow)

    # --- half-space --------------------------------------------------------
    denom = jnp.sum(d * plane_n_w)
    o_side = jnp.sum((o - plane_p_w) * plane_n_w)
    t_pl = -o_side / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    pl_inside = o_side <= 0.0
    t_plane = jnp.where(
        pl_inside,
        jnp.where(solid, 0.0, jnp.where(denom > 1e-12, t_pl, _BIG)),
        jnp.where(denom < -1e-12, t_pl, _BIG),
    )
    n_plane = jnp.where(pl_inside & solid, -d, plane_n_w)

    t = jnp.where(is_plane, t_plane, t_poly)
    n = jnp.where(is_plane, n_plane, n_poly)
    return jnp.where(t < _BIG, t, _BIG), n


def _world_geom(world: World2D):
    """World-space collider geometry: verts [M,V,2], plane normal/point."""
    col = world.colliders
    pos, angle = update_collider_poses(world)
    c, s = rot(angle)
    wv = pos[:, None, :] + rotate(c[:, None], s[:, None], col.poly_verts)
    plane_n = rotate(c, s, col.poly_verts[:, 0, :])
    return pos, angle, wv, plane_n


def _all_ray_hits(world, origin, direction, solid, qfilter):
    col = world.colliders
    pos, _, wv, plane_n = _world_geom(world)
    ok = collider_query_mask(col, qfilter)
    t, n = jax.vmap(
        lambda vw, cnt, r, pl, pn, pp: _ray_rounded_poly(
            origin, direction, vw, cnt, r, pl, pn, pp, solid
        )
    )(wv, col.vert_count, col.radius, col.is_plane, plane_n, pos)
    return jnp.where(ok, t, _BIG), n


def cast_ray(world, origin, direction, max_distance=_BIG, solid=True,
             qfilter: QueryFilter = None) -> RayHit2D:
    """First hit along the ray (``SpatialQuery::cast_ray``, 2D)."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    origin = jnp.asarray(origin, jnp.float32)
    direction = _normalize(jnp.asarray(direction, jnp.float32))
    t, n = _all_ray_hits(world, origin, direction, solid, qfilter)
    t = jnp.where(t <= max_distance, t, _BIG)
    i = jnp.argmin(t)
    hit = t[i] < _BIG
    return RayHit2D(
        collider=jnp.where(hit, i, -1).astype(jnp.int32),
        body=jnp.where(hit, world.colliders.body_idx[i], -1).astype(jnp.int32),
        distance=jnp.where(hit, t[i], jnp.inf),
        point=origin + direction * jnp.where(hit, t[i], 0.0),
        normal=n[i],
        hit=hit,
    )


def ray_hits(world, origin, direction, max_hits: int, max_distance=_BIG,
             solid=True, qfilter: QueryFilter = None) -> RayHit2D:
    """Up to ``max_hits`` nearest hits, sorted by distance (2D
    ``SpatialQuery::ray_hits``); misses padded with ``hit=False``."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    origin = jnp.asarray(origin, jnp.float32)
    direction = _normalize(jnp.asarray(direction, jnp.float32))
    t, n = _all_ray_hits(world, origin, direction, solid, qfilter)
    t = jnp.where(t <= max_distance, t, _BIG)
    k = min(max_hits, t.shape[0])
    neg_t, idx = jax.lax.top_k(-t, k)
    tk = -neg_t
    if k < max_hits:
        pad = max_hits - k
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        tk = jnp.concatenate([tk, jnp.full((pad,), _BIG, tk.dtype)])
    hit = tk < _BIG
    return RayHit2D(
        collider=jnp.where(hit, idx, -1).astype(jnp.int32),
        body=jnp.where(
            hit, world.colliders.body_idx[idx], -1
        ).astype(jnp.int32),
        distance=jnp.where(hit, tk, jnp.inf),
        point=origin[None, :]
        + direction[None, :] * jnp.where(hit, tk, 0.0)[:, None],
        normal=n[idx],
        hit=hit,
    )


# ---------------------------------------------------------------------------
# Point queries
# ---------------------------------------------------------------------------


def _point_one(p, verts_w, count, radius, is_plane, plane_n, plane_p):
    """(signed distance to the offset surface, closest surface point)."""
    closest, inside, n_face, face_d, _ = _closest_on_poly(p, verts_w, count)
    dist_core = jnp.where(inside, face_d, jnp.linalg.norm(p - closest))
    u_raw = jnp.where(inside, closest - p, p - closest)
    u = jnp.where(jnp.linalg.norm(u_raw) > 1e-9, _normalize(u_raw), n_face)
    surf = closest + radius * u
    d_poly = dist_core - radius

    d_plane = jnp.sum((p - plane_p) * plane_n)
    surf_plane = p - plane_n * d_plane

    d = jnp.where(is_plane, d_plane, d_poly)
    c = jnp.where(is_plane, surf_plane, surf)
    return d, c


def project_point(world, point, solid=True, qfilter: QueryFilter = None):
    """Closest collider to ``point`` (2D ``SpatialQuery::project_point``);
    same dict shape as the 3D module."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    point = jnp.asarray(point, jnp.float32)
    col = world.colliders
    pos, _, wv, plane_n = _world_geom(world)
    ok = collider_query_mask(col, qfilter)
    dists, cpts = jax.vmap(
        lambda vw, cnt, r, pl, pn, pp: _point_one(
            point, vw, cnt, r, pl, pn, pp
        )
    )(wv, col.vert_count, col.radius, col.is_plane, plane_n, pos)
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


def point_intersections(world, point, max_hits: int = 8,
                        qfilter: QueryFilter = None):
    """Indices of colliders containing ``point`` (padded with -1)."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    point = jnp.asarray(point, jnp.float32)
    col = world.colliders
    pos, _, wv, plane_n = _world_geom(world)
    ok = collider_query_mask(col, qfilter)
    dists, _ = jax.vmap(
        lambda vw, cnt, r, pl, pn, pp: _point_one(
            point, vw, cnt, r, pl, pn, pp
        )
    )(wv, col.vert_count, col.radius, col.is_plane, plane_n, pos)
    contains = ok & (dists <= 0.0)
    k = min(max_hits, contains.shape[0])
    _, idx = jax.lax.top_k(jnp.where(contains, 1.0, 0.0), k)
    out = jnp.where(contains[idx], idx, -1).astype(jnp.int32)
    if k < max_hits:
        out = jnp.concatenate([out, jnp.full((max_hits - k,), -1, jnp.int32)])
    return out


# ---------------------------------------------------------------------------
# Intersections
# ---------------------------------------------------------------------------


def aabb_intersections(world, aabb_min, aabb_max, max_hits: int = 8,
                       qfilter=None):
    """Collider indices whose AABB overlaps the given AABB (padded -1).
    Uses the stored AABBs (updated by the step / ``update_aabbs``)."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    col = world.colliders
    lo = jnp.asarray(aabb_min, jnp.float32)
    hi = jnp.asarray(aabb_max, jnp.float32)
    ok = collider_query_mask(col, qfilter) & jnp.all(
        (col.aabb_min <= hi[None, :]) & (lo[None, :] <= col.aabb_max),
        axis=-1,
    )
    k = min(max_hits, ok.shape[0])
    _, idx = jax.lax.top_k(jnp.where(ok, 1.0, 0.0), k)
    out = jnp.where(ok[idx], idx, -1).astype(jnp.int32)
    if k < max_hits:
        out = jnp.concatenate([out, jnp.full((max_hits - k,), -1, jnp.int32)])
    return out


def _manifold_vs_all(world, verts, count, radius, pose_pos, pose_angle):
    """Manifold of the query shape against every collider."""
    col = world.colliders
    pos, angle, _, _ = _world_geom(world)
    return jax.vmap(
        lambda cp, cang, cv, cc, cr, cpl: compute_manifold_2d(
            pose_pos, pose_angle, verts, count, radius,
            jnp.asarray(False),
            cp, cang, cv, cc, cr, cpl,
        )
    )(pos, angle, col.poly_verts, col.vert_count, col.radius, col.is_plane)


def shape_intersections(world, shape, shape_pos, shape_angle=0.0,
                        max_hits: int = 8, qfilter=None):
    """Collider indices intersecting the given query shape (padded -1).
    ``shape`` is a (verts, count, radius) triple from :func:`shape_circle`
    /:func:`shape_rect`/:func:`shape_capsule`/:func:`shape_polygon`."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    verts, count, radius = shape
    sp = jnp.asarray(shape_pos, jnp.float32)
    sa = jnp.asarray(shape_angle, jnp.float32)
    col = world.colliders
    ok = collider_query_mask(col, qfilter)
    m = _manifold_vs_all(world, verts, count, radius, sp, sa)
    hits = ok & (m.count > 0) & (jnp.min(m.separation, axis=-1) < 0.0)
    k = min(max_hits, hits.shape[0])
    _, idx = jax.lax.top_k(jnp.where(hits, 1.0, 0.0), k)
    out = jnp.where(hits[idx], idx, -1).astype(jnp.int32)
    if k < max_hits:
        out = jnp.concatenate([out, jnp.full((max_hits - k,), -1, jnp.int32)])
    return out


# ---------------------------------------------------------------------------
# Shape casting (conservative advancement over the manifold kernel)
# ---------------------------------------------------------------------------


@_register
@dataclass(frozen=True)
class ShapeHit2D:
    """Mirrors ``ShapeHitData`` (``shape_caster.rs``) on the 2D profile."""

    collider: jnp.ndarray  # i32[]
    body: jnp.ndarray      # i32[]
    distance: jnp.ndarray  # f32[] travel distance along the cast
    point_a: jnp.ndarray   # f32[2] witness on the cast shape at impact
    point_b: jnp.ndarray   # f32[2] witness on the hit collider
    normal: jnp.ndarray    # f32[2] surface normal on the hit collider
    hit: jnp.ndarray       # bool[]


def _sweep_all(world, shape, origin, angle, direction, max_distance,
               qfilter: QueryFilter):
    verts, count, radius = shape
    col = world.colliders
    pos, cangle, _, _ = _world_geom(world)
    ok = collider_query_mask(col, qfilter)
    o = jnp.asarray(origin, jnp.float32)
    sa = jnp.asarray(angle, jnp.float32)
    d = _normalize(jnp.asarray(direction, jnp.float32))

    def advance_one(cp, cang, cv, cc, cr, cpl):
        def manifold(t):
            return compute_manifold_2d(
                o + d * t, sa, verts, count, radius, jnp.asarray(False),
                cp, cang, cv, cc, cr, cpl,
            )

        def body_fn(_, state):
            t, done = state
            m = manifold(t)
            sep = jnp.min(m.separation)
            approach = jnp.dot(d, m.normal)  # normal points query->collider
            hit_now = sep < _EPS
            step = jnp.where(
                approach > 1e-6, sep / jnp.maximum(approach, 1e-6), _BIG
            )
            new_t = jnp.where(done | hit_now, t, t + jnp.maximum(step, 0.0))
            return (
                jnp.minimum(new_t, max_distance + 1.0),
                done | hit_now,
            )

        t, hit = jax.lax.fori_loop(
            0, _CAST_ITERS, body_fn, (jnp.asarray(0.0), jnp.asarray(False))
        )
        m = manifold(t)
        pi = jnp.argmin(m.separation)
        hit = hit & (t <= max_distance)
        return t, hit, m.point_a[pi], m.point_b[pi], m.normal

    t, hit, pa, pb, n = jax.vmap(advance_one)(
        pos, cangle, col.poly_verts, col.vert_count, col.radius, col.is_plane
    )
    t = jnp.where(ok & hit, t, _BIG)
    return t, pa, pb, n


def cast_shape(world, shape, origin, angle, direction, max_distance,
               qfilter: QueryFilter = None) -> ShapeHit2D:
    """First hit when sweeping the query shape (non-rotating) from
    ``origin`` along ``direction`` up to ``max_distance``."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    t, pa, pb, n = _sweep_all(
        world, shape, origin, angle, direction, max_distance, qfilter
    )
    col = world.colliders
    i = jnp.argmin(t)
    found = t[i] < _BIG
    return ShapeHit2D(
        collider=jnp.where(found, i, -1).astype(jnp.int32),
        body=jnp.where(found, col.body_idx[i], -1).astype(jnp.int32),
        distance=jnp.where(found, t[i], jnp.inf),
        point_a=pa[i],
        point_b=pb[i],
        normal=-n[i],
        hit=found,
    )


def shape_hits(world, shape, origin, angle, direction, max_distance,
               max_hits: int = 4, qfilter: QueryFilter = None) -> ShapeHit2D:
    """Up to ``max_hits`` sweep hits, nearest first: ONE sweep computes
    every collider's TOI; the nearest are read off with ``top_k``."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    t, pa, pb, n = _sweep_all(
        world, shape, origin, angle, direction, max_distance, qfilter
    )
    col = world.colliders
    k = min(max_hits, col.capacity)
    neg_t, idx = jax.lax.top_k(-t, k)
    tk = -neg_t
    found = tk < _BIG
    if k < max_hits:
        pad = max_hits - k
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        tk = jnp.concatenate([tk, jnp.full((pad,), _BIG, tk.dtype)])
        found = jnp.concatenate([found, jnp.zeros((pad,), bool)])
    return ShapeHit2D(
        collider=jnp.where(found, idx, -1).astype(jnp.int32),
        body=jnp.where(found, col.body_idx[idx], -1).astype(jnp.int32),
        distance=jnp.where(found, tk, jnp.inf),
        point_a=pa[idx],
        point_b=pb[idx],
        normal=-n[idx],
        hit=found,
    )


# ---------------------------------------------------------------------------
# Predicate variants (``system_param.rs:194`` family)
# ---------------------------------------------------------------------------


def _with_predicate(world, qfilter, predicate):
    qfilter = qfilter if qfilter is not None else QueryFilter()
    ids = jnp.arange(world.colliders.capacity, dtype=jnp.int32)
    keep = jnp.asarray(predicate(world, ids), bool)
    excluded = jnp.broadcast_to(qfilter.excluded, keep.shape) | ~keep
    return QueryFilter(mask=qfilter.mask, excluded=excluded)


def cast_ray_predicate(world, origin, direction, predicate,
                       max_distance=_BIG, solid=True,
                       qfilter: QueryFilter = None) -> RayHit2D:
    """First ray hit among colliders passing ``predicate``."""
    return cast_ray(
        world, origin, direction, max_distance, solid,
        _with_predicate(world, qfilter, predicate),
    )


def cast_shape_predicate(world, shape, origin, angle, direction, predicate,
                         max_distance=_BIG, qfilter: QueryFilter = None):
    """First shape-cast hit among colliders passing ``predicate``."""
    return cast_shape(
        world, shape, origin, angle, direction, max_distance,
        qfilter=_with_predicate(world, qfilter, predicate),
    )


def project_point_predicate(world, point, predicate, solid=True,
                            qfilter: QueryFilter = None):
    """Closest point among colliders passing ``predicate``."""
    return project_point(
        world, point, solid, _with_predicate(world, qfilter, predicate)
    )
