"""2D narrowphase: rounded-convex-polygon manifolds (<= 2 points).

ONE kernel covers every 2D shape pair — the Box2D-v3 unification the
reference's solver lineage descends from (``contact_types/mod.rs:479-481``
cites the same design family). Shapes are convex polygons with <= 8
vertices plus a rounding radius; the pair manifold is:

- circle vs circle (both 1-vertex): exact closest points;
- circle vs polygon: exact closest point on the core polygon;
- polygon vs polygon: SAT over both polygons' edge normals (a 2-vertex
  "polygon" (capsule/segment) contributes its +-perp normals through the
  same generic edge formula), reference-face selection with a tie bias to
  A for feature-id stability, incident-edge clipping -> 2 points with
  stable feature ids (edge/vertex indices), like the reference's Parry
  manifolds but branch-free and vmappable;
- anything vs half-space: per-vertex depths, 2 deepest kept.

Replaces Parry's 2D ``contact_manifolds`` dispatch
(``src/collision/collider/parry/mod.rs:420-441``) for the 2D profile.
Conventions match the 3D pipeline: normal points a -> b; separation
negative = penetrating; ``point_a``/``point_b`` on each shape's surface.
"""

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp

from avian_tpu.dim2.state import MAX_POLY_VERTS, MAX_POINTS_2D

_BIG = 1e9


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass(frozen=True)
class Manifold2D:
    normal: jnp.ndarray      # f32[2] world, a -> b
    point_a: jnp.ndarray     # f32[P, 2]
    point_b: jnp.ndarray     # f32[P, 2]
    separation: jnp.ndarray  # f32[P]
    feature_id: jnp.ndarray  # i32[P]
    count: jnp.ndarray       # i32[]


def _empty():
    return Manifold2D(
        normal=jnp.asarray([0.0, 1.0], jnp.float32),
        point_a=jnp.zeros((MAX_POINTS_2D, 2), jnp.float32),
        point_b=jnp.zeros((MAX_POINTS_2D, 2), jnp.float32),
        separation=jnp.full((MAX_POINTS_2D,), _BIG, jnp.float32),
        feature_id=jnp.zeros((MAX_POINTS_2D,), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


def _perp(v):
    """90deg CCW rotation; for CCW-wound polygons, -perp(edge) points
    outward — we use ``cross(edge) = (e.y, -e.x)`` which points OUTWARD
    for CCW winding."""
    return jnp.stack([v[..., 1], -v[..., 0]], axis=-1)


def _normalize(v, eps=1e-9):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


def rot(angle):
    """(cos, sin) pair."""
    return jnp.cos(angle), jnp.sin(angle)


def rotate(c, s, v):
    return jnp.stack(
        [c * v[..., 0] - s * v[..., 1], s * v[..., 0] + c * v[..., 1]],
        axis=-1,
    )


def world_verts(pos, angle, verts):
    c, s = rot(angle)
    return pos[None, :] + rotate(c, s, verts)


# ---------------------------------------------------------------------------
# Pair kernels (single pair; vmapped by the caller)
# ---------------------------------------------------------------------------


def _circle_circle(pa, ra, pb, rb):
    d = pb - pa
    dist = jnp.linalg.norm(d)
    n = jnp.where(dist > 1e-9, d / jnp.maximum(dist, 1e-9), jnp.asarray([1.0, 0.0]))
    sep = dist - ra - rb
    m = _empty()
    return Manifold2D(
        normal=n,
        point_a=m.point_a.at[0].set(pa + n * ra),
        point_b=m.point_b.at[0].set(pb - n * rb),
        separation=m.separation.at[0].set(sep),
        feature_id=m.feature_id,
        count=jnp.asarray(1, jnp.int32),
    )


def _closest_on_poly(p, verts, count):
    """Closest point on a convex polygon's boundary/interior to ``p``,
    plus (inside flag, deepest face normal, deepest face depth)."""
    v = verts  # [V, 2]
    idx = jnp.arange(MAX_POLY_VERTS)
    nxt = jnp.where(idx + 1 < count, idx + 1, 0)
    v2 = v[nxt]
    e = v2 - v
    valid_edge = (idx < count) & (count >= 2)

    # Projection of p onto each edge segment.
    t = jnp.sum((p[None, :] - v) * e, axis=-1) / jnp.maximum(
        jnp.sum(e * e, axis=-1), 1e-12
    )
    t = jnp.clip(t, 0.0, 1.0)
    proj = v + t[:, None] * e
    d2 = jnp.sum((p[None, :] - proj) ** 2, axis=-1)
    d2 = jnp.where(valid_edge, d2, _BIG)
    best = jnp.argmin(d2)
    closest = proj[best]

    # Inside test + deepest face (CCW winding, outward normals).
    n_out = _normalize(_perp(e))
    face_d = jnp.sum(n_out * (p[None, :] - v), axis=-1)  # >0 outside face
    face_d = jnp.where(valid_edge, face_d, -_BIG)
    deepest = jnp.argmax(face_d)  # least-negative = closest face
    inside = jnp.all(jnp.where(valid_edge, face_d <= 0.0, True)) & (count >= 3)
    return closest, inside, n_out[deepest], face_d[deepest], best


def _circle_poly(pa, ra, pb_pos, pb_angle, verts_b, count_b, rb):
    """Circle A vs rounded polygon B. Returns manifold with normal a->b."""
    vb = world_verts(pb_pos, pb_angle, verts_b)
    closest, inside, n_face, face_d, edge_id = _closest_on_poly(pa, vb, count_b)

    d = closest - pa
    dist = jnp.linalg.norm(d)
    n_out = jnp.where(
        dist > 1e-9, d / jnp.maximum(dist, 1e-9), -n_face
    )  # a -> b direction
    # Outside: separation = dist - radii. Inside: -(depth) - radii.
    n = jnp.where(inside, -n_face, n_out)
    sep = jnp.where(inside, face_d - ra - rb, dist - ra - rb)

    m = _empty()
    return Manifold2D(
        normal=n,
        point_a=m.point_a.at[0].set(pa + n * ra),
        point_b=m.point_b.at[0].set(
            jnp.where(inside, pa + n * (ra + sep), closest - n * rb)
        ),
        separation=m.separation.at[0].set(sep),
        feature_id=m.feature_id.at[0].set(edge_id.astype(jnp.int32)),
        count=jnp.asarray(1, jnp.int32),
    )


def _sat_faces(verts_r, count_r, verts_i, count_i):
    """Max separation of I's vertices over R's face normals.
    Returns (best_sep, best_edge_idx, best_normal)."""
    idx = jnp.arange(MAX_POLY_VERTS)
    nxt = jnp.where(idx + 1 < count_r, idx + 1, 0)
    e = verts_r[nxt] - verts_r
    valid = (idx < count_r) & (count_r >= 2)
    n = _normalize(_perp(e))  # outward for CCW

    # min over I's verts of dot(n_k, v_j - r_k)
    rel = verts_i[None, :, :] - verts_r[:, None, :]   # [E, V, 2]
    d = jnp.sum(n[:, None, :] * rel, axis=-1)          # [E, V]
    vmask = jnp.arange(MAX_POLY_VERTS)[None, :] < count_i
    d = jnp.where(vmask, d, _BIG)
    sep_k = jnp.min(d, axis=-1)                        # [E]
    sep_k = jnp.where(valid, sep_k, -_BIG)
    best = jnp.argmax(sep_k)
    return sep_k[best], best, n[best]


def _clip_segment(i0, i1, r0, r1):
    """Clip segment [i0, i1] to the slab spanned by reference edge
    [r0, r1] along its tangent. Returns (cp0, cp1)."""
    t = _normalize(r1 - r0)
    length = jnp.sum(t * (r1 - r0))
    a0 = jnp.sum(t * (i0 - r0))
    a1 = jnp.sum(t * (i1 - r0))
    da = a1 - a0
    safe = jnp.where(jnp.abs(da) > 1e-9, da, 1e-9)
    s_at0 = (0.0 - a0) / safe
    s_atL = (length - a0) / safe
    s_lo = jnp.minimum(s_at0, s_atL)
    s_hi = jnp.maximum(s_at0, s_atL)
    # Degenerate (parallel-to-normal) incident edges keep their endpoints.
    degen = jnp.abs(da) <= 1e-9
    s_min = jnp.where(degen, 0.0, jnp.clip(s_lo, 0.0, 1.0))
    s_max = jnp.where(degen, 1.0, jnp.clip(s_hi, 0.0, 1.0))
    cp0 = i0 + s_min * (i1 - i0)
    cp1 = i0 + s_max * (i1 - i0)
    return cp0, cp1


def _poly_poly(pa_pos, pa_angle, verts_a, count_a, ra,
               pb_pos, pb_angle, verts_b, count_b, rb):
    va = world_verts(pa_pos, pa_angle, verts_a)
    vb = world_verts(pb_pos, pb_angle, verts_b)

    sep_a, edge_a, n_a = _sat_faces(va, count_a, vb, count_b)
    sep_b, edge_b, n_b = _sat_faces(vb, count_b, va, count_a)

    # Reference face: bigger separation wins, 1e-4 bias to A for stable ids.
    flip = sep_b > sep_a + 1e-4
    verts_r = jnp.where(flip, vb, va)
    count_r = jnp.where(flip, count_b, count_a)
    verts_i = jnp.where(flip, va, vb)
    count_i = jnp.where(flip, count_a, count_b)
    r_r = jnp.where(flip, rb, ra)
    r_i = jnp.where(flip, ra, rb)
    ref_edge = jnp.where(flip, edge_b, edge_a)
    n = jnp.where(flip, n_b, n_a)  # outward from reference toward incident

    idx = jnp.arange(MAX_POLY_VERTS)
    # Incident edge: most anti-parallel to n among I's edges.
    nxt_i = jnp.where(idx + 1 < count_i, idx + 1, 0)
    e_i = verts_i[nxt_i] - verts_i
    n_i = _normalize(_perp(e_i))
    valid_i = (idx < count_i) & (count_i >= 2)
    anti = jnp.where(valid_i, jnp.sum(n_i * n[None, :], axis=-1), _BIG)
    inc_edge = jnp.argmin(anti)
    i0 = verts_i[inc_edge]
    i1 = verts_i[jnp.where(inc_edge + 1 < count_i, inc_edge + 1, 0)]
    # 1-vertex incident (shouldn't reach here; circles route elsewhere).
    i1 = jnp.where(count_i >= 2, i1, i0)

    r0 = verts_r[ref_edge]
    r1 = verts_r[jnp.where(ref_edge + 1 < count_r, ref_edge + 1, 0)]

    cp0, cp1 = _clip_segment(i0, i1, r0, r1)

    def mk(cp, k):
        s_raw = jnp.sum(n * (cp - r0))
        s = s_raw - r_r - r_i
        p_ref = cp - n * (s_raw - r_r)   # surface of reference shape
        p_inc = cp - n * r_i             # surface of incident shape
        return s, p_ref, p_inc, k

    s0, pr0, pi0, f0 = mk(cp0, 0)
    s1, pr1, pi1, f1 = mk(cp1, 1)

    # Collapse duplicate points (segment clipped to a point).
    dup = jnp.sum((cp1 - cp0) ** 2) < 1e-10
    count = jnp.where(dup, 1, 2).astype(jnp.int32)

    # Feature id: (flip, ref edge, incident edge, point k).
    fid_base = (
        jnp.where(flip, 1, 0) * 4096
        + ref_edge.astype(jnp.int32) * 256
        + inc_edge.astype(jnp.int32) * 16
    )

    # Map back to a/b convention: normal a -> b.
    n_ab = jnp.where(flip, -n, n)
    pa0 = jnp.where(flip, pi0, pr0)
    pb0 = jnp.where(flip, pr0, pi0)
    pa1 = jnp.where(flip, pi1, pr1)
    pb1 = jnp.where(flip, pr1, pi1)

    m = _empty()
    return Manifold2D(
        normal=n_ab,
        point_a=m.point_a.at[0].set(pa0).at[1].set(pa1),
        point_b=m.point_b.at[0].set(pb0).at[1].set(pb1),
        separation=m.separation.at[0].set(s0).at[1].set(
            jnp.where(dup, _BIG, s1)
        ),
        feature_id=m.feature_id.at[0].set(fid_base + f0).at[1].set(
            fid_base + f1
        ),
        count=count,
    )


def _poly_plane(p_pos, p_angle, verts, count, radius, plane_pos, plane_n):
    """Rounded polygon (or circle) A vs half-space B. Normal a->b = -plane_n."""
    v = world_verts(p_pos, p_angle, verts)
    d = jnp.sum(plane_n[None, :] * (v - plane_pos[None, :]), axis=-1) - radius
    vmask = jnp.arange(MAX_POLY_VERTS) < count
    d = jnp.where(vmask, d, _BIG)
    # Two deepest vertices.
    order = jnp.argsort(d)
    k0, k1 = order[0], order[1]
    n_ab = -plane_n
    m = _empty()

    def surf(k):
        pa = v[k] + n_ab * radius         # deepest point on A's surface
        pb = v[k] - plane_n * (d[k] + radius) + n_ab * 0.0  # on plane
        # project onto the plane: remove normal component
        pb = v[k] - plane_n * jnp.sum(plane_n * (v[k] - plane_pos))
        return pa, pb

    pa0, pb0 = surf(k0)
    pa1, pb1 = surf(k1)
    two = (count >= 2) & (d[k1] < _BIG / 2)
    return Manifold2D(
        normal=n_ab,
        point_a=m.point_a.at[0].set(pa0).at[1].set(pa1),
        point_b=m.point_b.at[0].set(pb0).at[1].set(pb1),
        separation=m.separation.at[0].set(d[k0]).at[1].set(
            jnp.where(two, d[k1], _BIG)
        ),
        feature_id=m.feature_id.at[0].set(k0.astype(jnp.int32)).at[1].set(
            k1.astype(jnp.int32)
        ),
        count=jnp.where(two, 2, 1).astype(jnp.int32),
    )


def _flip_manifold(m: Manifold2D) -> Manifold2D:
    return Manifold2D(
        normal=-m.normal,
        point_a=m.point_b,
        point_b=m.point_a,
        separation=m.separation,
        feature_id=m.feature_id,
        count=m.count,
    )


def compute_manifold_2d(
    pos_a, angle_a, verts_a, count_a, radius_a, plane_a,
    pos_b, angle_b, verts_b, count_b, radius_b, plane_b,
):
    """Manifold for one collider pair (vmapped by the pipeline).

    ``pos``/``angle`` are the collider world poses; ``verts`` the local
    polygon (for planes, ``verts[0]`` is the local outward normal).
    """
    # Circle world centers (1-vertex polygons may have an offset vertex).
    ca = pos_a + rotate(*rot(angle_a), verts_a[0])
    cb = pos_b + rotate(*rot(angle_b), verts_b[0])

    is_circle_a = (count_a == 1) & ~plane_a
    is_circle_b = (count_b == 1) & ~plane_b
    both_poly = ~plane_a & ~plane_b

    m_cc = _circle_circle(ca, radius_a, cb, radius_b)
    m_cp = _circle_poly(ca, radius_a, pos_b, angle_b, verts_b, count_b, radius_b)
    m_pc = _flip_manifold(
        _circle_poly(cb, radius_b, pos_a, angle_a, verts_a, count_a, radius_a)
    )
    m_pp = _poly_poly(
        pos_a, angle_a, verts_a, count_a, radius_a,
        pos_b, angle_b, verts_b, count_b, radius_b,
    )

    # Plane normal in world frame.
    na_w = rotate(*rot(angle_a), verts_a[0])
    nb_w = rotate(*rot(angle_b), verts_b[0])
    m_plane_b = _poly_plane(
        pos_a, angle_a, verts_a, count_a, radius_a, pos_b, nb_w
    )  # A vs plane B: normal a->b = -plane_n: OK
    m_plane_a = _flip_manifold(
        _poly_plane(pos_b, angle_b, verts_b, count_b, radius_b, pos_a, na_w)
    )

    def sel(c, x, y):
        return jax.tree.map(lambda u, v: jnp.where(c, u, v), x, y)

    m = sel(
        plane_a & plane_b,
        _empty(),
        sel(
            plane_b,
            m_plane_b,
            sel(
                plane_a,
                m_plane_a,
                sel(
                    both_poly & is_circle_a & is_circle_b,
                    m_cc,
                    sel(
                        both_poly & is_circle_a,
                        m_cp,
                        sel(both_poly & is_circle_b, m_pc, m_pp),
                    ),
                ),
            ),
        ),
    )
    return m
