"""Generic convex-convex contact manifolds via support mappings.

TPU-native replacement for Parry's support-map contact dispatch — the
GJK/EPA fallback the reference uses for every pair without a dedicated
kernel (``src/collision/collider/parry/contact_query.rs:190-225``). A
branching GJK+EPA is hostile to ``vmap``/XLA, so the design here is a
fixed-iteration, branch-free pipeline:

1. **Direction finding.**
   - Separated / shallow: Frank-Wolfe iteration on ``min |x|^2`` over the
     Minkowski difference ``K = A (-) B`` (the simplex-free formulation of
     GJK distance). Each step takes one support point ``s_K(-x)`` and a
     closed-form line-search toward it; 24 iterations.
   - Penetrating: projected subgradient descent of the support function
     ``sigma_K(d)`` over the unit sphere (the gradient of a support
     function IS its support point), minimizing directional overlap —
     converging to the minimum-translation direction for shallow overlap.
   Both run unconditionally (static shapes); the result is selected by a
   penetration mask.
2. **Normal polishing.** The raw iterative normal is snapped to the best
   aligned *flat feature* normal (box face, cylinder cap, cone base...):
   flat-on-flat resting contacts then get exact normals, which is what
   stacking stability needs.
3. **Manifold.** Each shape emits its *support patch* along the contact
   normal (face polygon, segment, or point, as fixed 8-slot rings); the
   incident patch is clipped against the reference patch in the 2D plane
   orthogonal to the normal (Sutherland-Hodgman over masked half-planes,
   like ``box_box``), reduced to <= 4 points, and lifted back onto each
   shape's patch plane so per-point separations are exact for face-face
   contacts.

Everything is straight-line code over fixed-size arrays: one ``vmap``
evaluates the whole pair buffer on the VPU.
"""

import numpy as _np

import jax
import jax.numpy as jnp

from avian_tpu.math import quat as quat_m
from avian_tpu.math import vec

_FW_ITERS = 24        # Frank-Wolfe distance iterations
_DEPTH_ITERS = 20     # subgradient depth-direction iterations
_PATCH = 8            # support patch ring capacity
_CLIP = 16            # clip buffer capacity
_FACE_SNAP = 0.98     # cos threshold: snap normal to a flat feature
_FACE_TOL = 0.98      # cos threshold: direction counts as hitting a face
_SIDE_TOL = 0.05      # sin threshold: direction counts as hitting a side

_EPS = 1e-9

# Unit circle samples for disc patches (cylinder caps, cone base).
_DISC_ANGLES = _np.linspace(0.0, 2.0 * _np.pi, _PATCH, endpoint=False)
_DISC_COS = _np.cos(_DISC_ANGLES).astype(_np.float32)
_DISC_SIN = _np.sin(_DISC_ANGLES).astype(_np.float32)

_Y = _np.asarray([0.0, 1.0, 0.0], _np.float32)
_XAXIS = _np.asarray([1.0, 0.0, 0.0], _np.float32)


def _nrm(d, fallback=None):
    if fallback is None:
        fallback = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    return vec.normalize_or(d, fallback)


# ---------------------------------------------------------------------------
# Local-frame support functions: support(params, d) -> point, d unit-ish.
# ---------------------------------------------------------------------------


def support_sphere(prm, d):
    return prm[0] * _nrm(d)


def support_capsule(prm, d):
    h, r = prm[0], prm[1]
    seg = jnp.asarray(_Y) * (h * jnp.sign(d[1]))
    return seg + r * _nrm(d)


def support_box(prm, d):
    return jnp.where(d >= 0.0, prm[:3], -prm[:3])


def support_segment(prm, d):
    """Segment on local X with half-length ``prm[0]``
    (reference ``parry/mod.rs:817`` ``Collider::segment``)."""
    h = prm[0]
    sx = jnp.sign(d[0]) + (d[0] == 0.0)
    return jnp.asarray(_XAXIS) * (h * sx)


def support_cylinder(prm, d):
    h, r = prm[0], prm[1]
    dxz = jnp.sqrt(d[0] * d[0] + d[2] * d[2])
    scale = r / jnp.maximum(dxz, _EPS)
    radial = jnp.where(
        dxz > _EPS,
        jnp.asarray([1.0, 0.0, 1.0], jnp.float32) * d * scale,
        jnp.zeros(3, jnp.float32),
    )
    return radial + jnp.asarray(_Y) * (h * jnp.sign(d[1]))


def support_cone(prm, d):
    """Cone: base disc at y=-h, apex at (0, +h, 0)."""
    h, r = prm[0], prm[1]
    dxz = jnp.sqrt(d[0] * d[0] + d[2] * d[2])
    # Apex wins when d.y exceeds the slant sine.
    sin_a = r / jnp.sqrt(r * r + 4.0 * h * h)
    dn = jnp.sqrt(jnp.maximum(vec.length_sq(d), _EPS * _EPS))
    use_apex = d[1] > sin_a * dn
    scale = r / jnp.maximum(dxz, _EPS)
    rim = (
        jnp.where(
            dxz > _EPS,
            jnp.asarray([1.0, 0.0, 1.0], jnp.float32) * d * scale,
            jnp.zeros(3, jnp.float32),
        )
        - jnp.asarray(_Y) * h
    )
    apex = jnp.asarray(_Y) * h
    return jnp.where(use_apex, apex, rim)


# ---------------------------------------------------------------------------
# Support patches: patch(params, d) -> (pts[8,3], face_normal[3], count).
# ``pts`` is an ordered ring on the shape surface supporting direction
# ``d``; ``face_normal`` is the outward normal of the patch's plane.
# ---------------------------------------------------------------------------


def patch_sphere(prm, d):
    dn = _nrm(d)
    p = prm[0] * dn
    pts = jnp.broadcast_to(p, (_PATCH, 3))
    return pts, dn, jnp.asarray(1, jnp.int32)


def patch_capsule(prm, d):
    h, r = prm[0], prm[1]
    dn = _nrm(d)
    perp = jnp.asarray([1.0, 0.0, 1.0], jnp.float32) * dn
    perp = _nrm(perp, jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    is_side = jnp.abs(dn[1]) < (1.0 - _SIDE_TOL)
    # Side: the two segment endpoints pushed to the surface along perp.
    p0 = -h * jnp.asarray(_Y) + r * perp
    p1 = h * jnp.asarray(_Y) + r * perp
    pole = support_capsule(prm, d)
    pts = jnp.broadcast_to(pole, (_PATCH, 3))
    pts = jnp.where(is_side, pts.at[0].set(p0).at[1].set(p1), pts)
    nf = jnp.where(is_side, perp, dn)
    cnt = jnp.where(is_side, 2, 1).astype(jnp.int32)
    return pts, nf, cnt


def patch_segment(prm, d):
    """Segment patch: the whole edge when the direction is mostly
    perpendicular to the segment axis, else the near endpoint."""
    h = prm[0]
    dn = _nrm(d)
    perp = jnp.asarray([0.0, 1.0, 1.0], jnp.float32) * dn
    perp = _nrm(perp, jnp.asarray(_Y))
    is_edge = jnp.abs(dn[0]) < (1.0 - _SIDE_TOL)
    p0 = -h * jnp.asarray(_XAXIS)
    p1 = h * jnp.asarray(_XAXIS)
    end = support_segment(prm, d)
    pts = jnp.broadcast_to(end, (_PATCH, 3))
    pts = jnp.where(is_edge, pts.at[0].set(p0).at[1].set(p1), pts)
    nf = jnp.where(is_edge, perp, dn)
    cnt = jnp.where(is_edge, 2, 1).astype(jnp.int32)
    return pts, nf, cnt


def patch_box(prm, d):
    h = prm[:3]
    dn = _nrm(d)
    ax = jnp.argmax(jnp.abs(dn))
    s = jnp.sign(dn[ax]) + (dn[ax] == 0.0)  # never 0
    eye = jnp.eye(3, dtype=jnp.float32)
    n_face = eye[ax] * s
    u = eye[(ax + 1) % 3] * h[(ax + 1) % 3]
    v = eye[(ax + 2) % 3] * h[(ax + 2) % 3]
    c = n_face * h[ax]
    quad = jnp.asarray(
        [[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]], jnp.float32
    )
    pts4 = c[None, :] + quad[:, 0:1] * u[None, :] + quad[:, 1:2] * v[None, :]
    pts = jnp.concatenate(
        [pts4, jnp.broadcast_to(pts4[0:1], (_PATCH - 4, 3))], axis=0
    )
    return pts, n_face, jnp.asarray(4, jnp.int32)


def patch_cylinder(prm, d):
    h, r = prm[0], prm[1]
    dn = _nrm(d)
    sy = jnp.sign(dn[1]) + (dn[1] == 0.0)
    perp = jnp.asarray([1.0, 0.0, 1.0], jnp.float32) * dn
    perp = _nrm(perp, jnp.asarray([1.0, 0.0, 0.0], jnp.float32))

    is_cap = jnp.abs(dn[1]) > _FACE_TOL
    is_side = jnp.abs(dn[1]) < _SIDE_TOL

    # Cap: 8-point disc ring at y = sy*h.
    disc = jnp.stack(
        [r * jnp.asarray(_DISC_COS), jnp.zeros(_PATCH, jnp.float32),
         r * jnp.asarray(_DISC_SIN)],
        axis=-1,
    ) + (sy * h) * jnp.asarray(_Y)[None, :]
    # Side: vertical line on the surface.
    p0 = -h * jnp.asarray(_Y) + r * perp
    p1 = h * jnp.asarray(_Y) + r * perp
    # Rim: single support point.
    rim = support_cylinder(prm, d)

    pts = jnp.where(
        is_cap,
        disc,
        jnp.where(
            is_side,
            jnp.broadcast_to(rim, (_PATCH, 3)).at[0].set(p0).at[1].set(p1),
            jnp.broadcast_to(rim, (_PATCH, 3)),
        ),
    )
    nf = jnp.where(
        is_cap, sy * jnp.asarray(_Y), jnp.where(is_side, perp, dn)
    )
    cnt = jnp.where(is_cap, _PATCH, jnp.where(is_side, 2, 1)).astype(jnp.int32)
    return pts, nf, cnt


def patch_cone(prm, d):
    h, r = prm[0], prm[1]
    dn = _nrm(d)
    perp = jnp.asarray([1.0, 0.0, 1.0], jnp.float32) * dn
    perp = _nrm(perp, jnp.asarray([1.0, 0.0, 0.0], jnp.float32))

    is_base = dn[1] < -_FACE_TOL
    sin_a = r / jnp.sqrt(r * r + 4.0 * h * h)
    is_apex = dn[1] > sin_a + _SIDE_TOL

    disc = jnp.stack(
        [r * jnp.asarray(_DISC_COS), jnp.zeros(_PATCH, jnp.float32),
         r * jnp.asarray(_DISC_SIN)],
        axis=-1,
    ) - h * jnp.asarray(_Y)[None, :]
    apex = h * jnp.asarray(_Y)
    rim = r * perp - h * jnp.asarray(_Y)
    # Side line: apex -> base rim point; slant outward normal.
    slant_n = _nrm(2.0 * h * perp + r * jnp.asarray(_Y))
    side = jnp.broadcast_to(rim, (_PATCH, 3)).at[0].set(apex).at[1].set(rim)

    pts = jnp.where(
        is_base,
        disc,
        jnp.where(
            is_apex, jnp.broadcast_to(apex, (_PATCH, 3)), side
        ),
    )
    nf = jnp.where(
        is_base, -jnp.asarray(_Y), jnp.where(is_apex, dn, slant_n)
    )
    cnt = jnp.where(is_base, _PATCH, jnp.where(is_apex, 1, 2)).astype(
        jnp.int32
    )
    return pts, nf, cnt


# ---------------------------------------------------------------------------
# Direction finding
# ---------------------------------------------------------------------------


def _world_support(support_fn, prm, pos, quat):
    def s(d_world):
        d_local = quat_m.rotate_inv(quat, d_world)
        return pos + quat_m.rotate(quat, support_fn(prm, d_local))

    return s


def _minkowski_support(sa, sb):
    """Support of K = A (-) B: s_K(d) = s_A(d) - s_B(-d)."""

    def s(d):
        return sa(d) - sb(-d)

    return s


def _closest_on_triangle_to_origin(a, b, c):
    """Closest point to the origin on triangle (a, b, c) — branch-free
    Voronoi-region selection (Ericson, Real-Time Collision Detection
    §5.1.5, specialized to query point 0). Degenerate (colinear /
    duplicate-vertex) triangles fall through to the edge/vertex regions,
    whose divisions are eps-guarded."""
    ab = b - a
    ac = c - a
    ap = -a
    d1 = vec.dot(ab, ap)
    d2 = vec.dot(ac, ap)
    bp = -b
    d3 = vec.dot(ab, bp)
    d4 = vec.dot(ac, bp)
    cp = -c
    d5 = vec.dot(ab, cp)
    d6 = vec.dot(ac, cp)

    in_a = (d1 <= 0.0) & (d2 <= 0.0)
    in_b = (d3 >= 0.0) & (d4 <= d3)
    in_c = (d6 >= 0.0) & (d5 <= d6)

    vc = d1 * d4 - d3 * d2
    in_ab = (vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0)
    t_ab = d1 / jnp.maximum(d1 - d3, _EPS)
    p_ab = a + t_ab * ab

    vb = d5 * d2 - d1 * d6
    in_ac = (vb <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0)
    t_ac = d2 / jnp.maximum(d2 - d6, _EPS)
    p_ac = a + t_ac * ac

    va = d3 * d6 - d5 * d4
    in_bc = (va <= 0.0) & (d4 - d3 >= 0.0) & (d5 - d6 >= 0.0)
    t_bc = (d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), _EPS)
    p_bc = b + t_bc * (c - b)

    denom = va + vb + vc
    v = vb / jnp.where(jnp.abs(denom) > _EPS, denom, _EPS)
    w = vc / jnp.where(jnp.abs(denom) > _EPS, denom, _EPS)
    p_int = a + ab * v + ac * w

    # Priority cascade: vertex regions, then edges, then interior.
    p = p_int
    p = jnp.where(in_bc, p_bc, p)
    p = jnp.where(in_ac, p_ac, p)
    p = jnp.where(in_ab, p_ab, p)
    p = jnp.where(in_c, c, p)
    p = jnp.where(in_b, b, p)
    p = jnp.where(in_a, a, p)
    return p


def _fw_distance(sk, x0):
    """Closest point of K to the origin from ``x0`` in K: a working-set
    Frank-Wolfe (GJK-style 2-simplex) iteration. Each step projects the
    origin onto the triangle spanned by the current iterate, the new
    support point, and the previous support point — vanilla FW's
    line-search zigzags at O(1/k) near Minkowski-polytope edges (measured
    ~0.08 distance error at 24 iters for a capsule-vs-box corner, which
    stalled the character controller on a step); the triangle projection
    resolves edge-closest configurations in a few iterations."""

    def body(carry, _):
        x, s_prev = carry
        s = sk(-x)
        x_new = _closest_on_triangle_to_origin(x, s, s_prev)
        return (x_new, s), None

    (x, _), _ = jax.lax.scan(
        body, (x0, sk(-x0)), None, length=_FW_ITERS
    )
    return x


def _depth_direction(sk, d0):
    """Minimize sigma_K(d) over |d|=1 by projected subgradient descent;
    for origin-in-K this converges to the minimum-overlap direction."""

    def body(carry, i):
        d, best_d, best_v = carry
        s = sk(d)
        v = vec.dot(s, d)
        better = v < best_v
        best_d = jnp.where(better, d, best_d)
        best_v = jnp.where(better, v, best_v)
        # Step size ~ 1/sqrt(i); gradient = s projected tangent to sphere.
        g = s - v * d
        step = 0.5 / jnp.sqrt(1.0 + i.astype(jnp.float32))
        d_new = _nrm(d - step * g, d)
        return (d_new, best_d, best_v), None

    s0 = sk(d0)
    carry, _ = jax.lax.scan(
        body,
        (d0, d0, vec.dot(s0, d0)),
        jnp.arange(_DEPTH_ITERS),
    )
    _, best_d, best_v = carry
    return best_d, best_v


# ---------------------------------------------------------------------------
# Patch clipping manifold
# ---------------------------------------------------------------------------


def _clip_halfplane(q, fids, count, n2, off, fid_base):
    """Sutherland-Hodgman clip of a 2D ring ``q[16, 2]`` against
    ``dot(n2, p) <= off`` (``box_box._clip_axis`` generalized to arbitrary
    half-planes)."""
    P = q.shape[0]
    idx = jnp.arange(P)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    nxt_q = q[nxt]
    d_cur = q @ n2 - off
    d_nxt = nxt_q @ n2 - off
    in_cur = d_cur <= 0.0
    edge_valid = idx < count
    crossing = edge_valid & (in_cur != (d_nxt <= 0.0))

    t = d_cur / jnp.where(
        jnp.abs(d_cur - d_nxt) > 1e-12, d_cur - d_nxt, 1e-12
    )
    inter = q + (nxt_q - q) * jnp.clip(t, 0.0, 1.0)[:, None]

    emit_q = jnp.concatenate([q, inter], axis=0)          # [2P, 2]
    emit_f = jnp.concatenate([fids, fid_base + idx], axis=0)
    emit_ok = jnp.concatenate([edge_valid & in_cur, crossing])
    order_key = jnp.concatenate([2 * idx, 2 * idx + 1])
    key = jnp.where(emit_ok, order_key, 2 * P + order_key)
    _, qq0, qq1, ff, ok = jax.lax.sort(
        [key, emit_q[:, 0], emit_q[:, 1], emit_f, emit_ok.astype(jnp.int32)],
        num_keys=1,
    )
    out_q = jnp.stack([qq0[:P], qq1[:P]], axis=-1)
    out_count = jnp.minimum(jnp.sum(emit_ok.astype(jnp.int32)), P)
    pad = jnp.arange(P) >= out_count
    out_q = jnp.where(pad[:, None], out_q[0:1], out_q)
    return out_q, ff[:P], out_count


def _reduce4(uv, seps, fids, count):
    """Reduce a clipped 2D point set to <= 4 points: deepest, farthest,
    max/min signed area (same scheme as ``box_box``)."""
    P = uv.shape[0]
    valid = jnp.arange(P) < count
    seps = jnp.where(valid, seps, 1e9)
    idx0 = jnp.argmin(seps)
    p0 = uv[idx0]
    d2 = jnp.where(valid, jnp.sum((uv - p0) ** 2, axis=-1), -1.0)
    d2 = d2.at[idx0].set(-1.0)
    idx1 = jnp.argmax(d2)
    e1 = uv[idx1] - p0
    cr = e1[0] * (uv[:, 1] - p0[1]) - e1[1] * (uv[:, 0] - p0[0])
    cr_mask = jnp.where(valid, cr, 0.0)
    cr_mask = cr_mask.at[idx0].set(0.0).at[idx1].set(0.0)
    idx2 = jnp.argmax(cr_mask)
    idx3 = jnp.argmin(cr_mask)

    sel = jnp.stack([idx0, idx1, idx2, idx3])
    first = jnp.asarray(
        [
            True,
            sel[1] != sel[0],
            (sel[2] != sel[0]) & (sel[2] != sel[1]),
            (sel[3] != sel[0]) & (sel[3] != sel[1]) & (sel[3] != sel[2]),
        ]
    )
    ok = first & valid[sel]
    return sel, ok


def generic_convex_pair(support_a, patch_a, support_b, patch_b,
                        flat_a_fn=None, flat_b_fn=None):
    """Build a dispatchable pair function for two support-mapped shapes.

    ``flat_*_fn(prm) -> bool`` marks a shape as FLAT (zero-thickness
    triangle): its face normal then dominates the contact normal whenever
    the contact is frontal — the standard cure for sideways
    minimum-translation directions at triangle-mesh internal edges."""

    def pair_fn(pa, qa, prm_a, pb, qb, prm_b):
        from avian_tpu.geometry.narrowphase import Manifold, _empty

        sa = _world_support(support_a, prm_a, pa, qa)
        sb = _world_support(support_b, prm_b, pb, qb)
        sk = _minkowski_support(sa, sb)

        # --- direction -----------------------------------------------------
        x0 = pa - pb
        x = _fw_distance(sk, x0)
        dist = vec.length(x)
        sep_dir = _nrm(-x, _nrm(pb - pa))  # A -> B for separated shapes

        d_pen, overlap = _depth_direction(sk, _nrm(pb - pa))
        # sigma_K(u) = directional overlap (how far B must move along +u to
        # separate); its minimizer u* IS the minimum-translation direction,
        # and points from A toward B (1D check: A=[0,2], B=[1,3] -> u*=+1).
        #
        # Classification: FW's residual |x| when the origin is INSIDE K is
        # ~1e-3..1e-2 in f32 (the working-set simplex collapses around the
        # origin), so |x| alone misclassifies near-touching configs — and
        # below ~1e-2 the FW direction is noise-dominated anyway. In that
        # near zone trust the depth search instead: sigma* > 0 means no
        # separating direction was found (penetrating), sigma* < 0
        # certifies separation; either way d_pen is the meaningful normal
        # there (the true separation is re-measured from the patches along
        # the final normal, so a borderline misclassification only changes
        # the normal SOURCE, not the sign of the emitted separation).
        penetrating = (dist < 1e-4) | ((dist < 1e-2) & (overlap > 0.0))
        n = jnp.where(penetrating, _nrm(d_pen), sep_dir)

        # --- patches + polish ---------------------------------------------
        def get_patch(patch_fn, prm, pos, quat, d_world):
            d_local = quat_m.rotate_inv(quat, d_world)
            pts_l, nf_l, cnt = patch_fn(prm, d_local)
            pts_w = pos[None, :] + quat_m.rotate(quat[None, :], pts_l)
            nf_w = quat_m.rotate(quat, nf_l)
            return pts_w, nf_w, cnt

        pts_a, nf_a, cnt_a = get_patch(patch_a, prm_a, pa, qa, n)
        pts_b, nf_b, cnt_b = get_patch(patch_b, prm_b, pb, qb, -n)

        align_a = vec.dot(nf_a, n)
        align_b = vec.dot(nf_b, -n)
        # Only multi-point patches are snap candidates, and they compete
        # only with each other: a 1-point patch (sphere pole, cylinder
        # rim) always has align == 1 by construction and must not veto
        # the other side's flat feature (e.g. sphere-vs-segment, where
        # the subgradient normal stalls at the |d_x| kink of the long
        # Minkowski capsule and the edge snap is the cure).
        elig_a = (align_a > _FACE_SNAP) & (cnt_a >= 2)
        elig_b = (align_b > _FACE_SNAP) & (cnt_b >= 2)
        snap_a = elig_a & (~elig_b | (align_a >= align_b))
        snap_b = elig_b & ~snap_a
        n = jnp.where(snap_a, nf_a, jnp.where(snap_b, -nf_b, n))
        # Flat shapes dominate: any frontal contact snaps to their plane.
        flat_a = (
            flat_a_fn(prm_a) if flat_a_fn is not None else jnp.asarray(False)
        )
        flat_b = (
            flat_b_fn(prm_b) if flat_b_fn is not None else jnp.asarray(False)
        )
        prefer_b = flat_b & (align_b > 0.3) & (cnt_b >= 3)
        prefer_a = flat_a & (align_a > 0.3) & (cnt_a >= 3) & (
            ~prefer_b | (align_a > align_b)
        )
        n = jnp.where(
            prefer_a, nf_a, jnp.where(prefer_b, -nf_b, n)
        )
        n = _nrm(n)

        # Re-emit patches along the polished normal.
        pts_a, nf_a, cnt_a = get_patch(patch_a, prm_a, pa, qa, n)
        pts_b, nf_b, cnt_b = get_patch(patch_b, prm_b, pb, qb, -n)

        # --- 2D frame ------------------------------------------------------
        t1 = vec.any_orthonormal(n)
        t2 = jnp.cross(n, t1)
        to2d = lambda p: jnp.stack([p @ t1, p @ t2], axis=-1)

        a2 = to2d(pts_a)  # [8, 2]
        b2 = to2d(pts_b)

        # Reference = the patch with more points (tie -> better aligned).
        ref_is_a = (cnt_a > cnt_b) | ((cnt_a == cnt_b) & (align_a >= align_b))
        ref2 = jnp.where(ref_is_a, a2, b2)
        ref_cnt = jnp.where(ref_is_a, cnt_a, cnt_b)
        inc2 = jnp.where(ref_is_a, b2, a2)
        inc_cnt = jnp.where(ref_is_a, cnt_b, cnt_a)

        # Clip incident ring against the reference polygon's edge planes.
        q = jnp.concatenate(
            [inc2, jnp.broadcast_to(inc2[0:1], (_CLIP - _PATCH, 2))], axis=0
        )
        q = jnp.where(
            (jnp.arange(_CLIP) < inc_cnt)[:, None], q, q[0:1]
        )
        fids = jnp.where(
            jnp.arange(_CLIP) < inc_cnt, jnp.arange(_CLIP), 0
        ).astype(jnp.int32)
        cnt = jnp.minimum(inc_cnt, _CLIP)

        centroid = jnp.sum(
            jnp.where((jnp.arange(_PATCH) < ref_cnt)[:, None], ref2, 0.0),
            axis=0,
        ) / jnp.maximum(ref_cnt.astype(jnp.float32), 1.0)

        clip_on = ref_cnt >= 3
        for e in range(_PATCH):
            v0 = ref2[e]
            v1 = ref2[jnp.where(e + 1 >= ref_cnt, 0, e + 1)]
            edge = v1 - v0
            n2 = jnp.stack([-edge[1], edge[0]])
            n2 = n2 * jnp.sign(vec.dot(n2, centroid - v0) + 1e-12)
            n2 = -n2  # outward; clip keeps dot(n2, p) <= off
            off = vec.dot(n2, v0)
            edge_active = clip_on & (e < ref_cnt) & (vec.length(edge) > 1e-9)
            # Inactive edges clip nothing: push the plane to infinity.
            off = jnp.where(edge_active, off, 1e12)
            n2 = jnp.where(edge_active, n2, jnp.asarray([1.0, 0.0]))
            q, fids, cnt = _clip_halfplane(q, fids, cnt, n2, off, 16 + 8 * e)

        # --- lift back to 3D + separations --------------------------------
        # Plane of each patch: through its first point with its face normal;
        # degenerate patches (point/segment) fall back to a plane orthogonal
        # to n so the lift is the point itself.
        def lift(q2, pts, nf, cnt_s):
            p3 = q2[:, 0:1] * t1[None, :] + q2[:, 1:2] * t2[None, :]
            # Solve p3 + s*n on plane: dot(nf, p3 + s*n - p0) = 0.
            nfn = vec.dot(nf, n)
            safe = jnp.abs(nfn) > 0.2
            p0 = pts[0]
            s = jnp.where(
                safe,
                (vec.dot(nf, p0) - p3 @ nf) / jnp.where(safe, nfn, 1.0),
                p0 @ n - p3 @ n,
            )
            return p3 + s[:, None] * n[None, :]

        p_on_a = lift(q, pts_a, nf_a, cnt_a)
        p_on_b = lift(q, pts_b, nf_b, cnt_b)
        seps = (p_on_b - p_on_a) @ n

        sel, ok = _reduce4(q, seps, fids, cnt)
        out_pa = p_on_a[sel]
        out_pb = p_on_b[sel]
        out_sep = jnp.where(ok, seps[sel], 1e9)
        out_fid = jnp.where(ok, fids[sel], 0)
        out_cnt = jnp.sum(ok.astype(jnp.int32))

        clipped = Manifold(
            normal=n,
            point_a=out_pa,
            point_b=out_pb,
            separation=out_sep,
            feature_id=out_fid,
            count=out_cnt,
        )

        # --- degenerate cases ---------------------------------------------
        # min patch = point, or reference not a polygon: 1-2 point manifold
        # from the patch points directly (support witnesses).
        m = _empty()
        k = jnp.minimum(jnp.minimum(cnt_a, cnt_b), 2)
        # Pair up to 2 points: project incident points onto the other patch
        # plane along n.
        pa2 = pts_a[:2]
        pb2 = pts_b[:2]
        # For segment-segment (2,2): closest points along each; otherwise
        # the single support points.
        both_seg = (cnt_a == 2) & (cnt_b == 2)
        dir_a = _nrm(pts_a[1] - pts_a[0])
        parallel = jnp.abs(
            vec.dot(dir_a, _nrm(pts_b[1] - pts_b[0]))
        ) > 0.999

        # 1D overlap of the two segments along dir_a (parallel case).
        ta0 = vec.dot(pts_a[0], dir_a)
        ta1 = vec.dot(pts_a[1], dir_a)
        tb0 = vec.dot(pts_b[0], dir_a)
        tb1 = vec.dot(pts_b[1], dir_a)
        lo = jnp.maximum(jnp.minimum(ta0, ta1), jnp.minimum(tb0, tb1))
        hi = jnp.minimum(jnp.maximum(ta0, ta1), jnp.maximum(tb0, tb1))
        t_mid = jnp.stack([lo, hi])
        seg_pa = pts_a[0][None, :] + (t_mid - ta0)[:, None] * dir_a[None, :]
        seg_pb = seg_pa + (
            (pts_b[0] - pts_a[0])
            - vec.dot(pts_b[0] - pts_a[0], dir_a) * dir_a
        )[None, :]
        use_seg2 = both_seg & parallel & (hi >= lo)

        pa_deg = jnp.where(use_seg2, seg_pa, pa2)
        pb_deg = jnp.where(use_seg2, seg_pb, pb2)
        sep_deg = (pb_deg - pa_deg) @ n
        cnt_deg = jnp.where(use_seg2, 2, jnp.minimum(k, 1) * 1).astype(
            jnp.int32
        )
        # For the plain degenerate case use the closest support witnesses.
        wa = sa(n)
        wb = sb(-n)
        pa_deg = jnp.where(use_seg2, pa_deg, pa_deg.at[0].set(wa))
        pb_deg = jnp.where(use_seg2, pb_deg, pb_deg.at[0].set(wb))
        sep_deg = jnp.where(
            use_seg2, sep_deg, sep_deg.at[0].set(vec.dot(wb - wa, n))
        )

        degenerate = Manifold(
            normal=n,
            point_a=m.point_a.at[:2].set(pa_deg),
            point_b=m.point_b.at[:2].set(pb_deg),
            separation=m.separation.at[:2].set(
                jnp.where(jnp.arange(2) < cnt_deg, sep_deg, 1e9)
            ),
            feature_id=m.feature_id.at[:2].set(jnp.arange(2, dtype=jnp.int32)),
            count=cnt_deg,
        )

        use_clip = (ref_cnt >= 3) & (out_cnt > 0)
        return jax.tree.map(
            lambda dg, cl: jnp.where(use_clip, cl, dg), degenerate, clipped
        )

    return pair_fn


def support_patch_plane_pair(support_fn, patch_fn):
    """Shape-vs-half-space manifold: the shape's support patch along the
    plane's inward normal, separations = patch distances to the plane
    (covers cylinder/cone/convex vs plane without any iteration)."""

    def pair_fn(pa, qa, prm_a, pb, qb, prm_b):
        from avian_tpu.geometry.narrowphase import Manifold, _empty

        n_plane = quat_m.rotate(qb, prm_b[:3])  # outward plane normal
        d_local = quat_m.rotate_inv(qa, -n_plane)
        pts_l, _nf, cnt = patch_fn(prm_a, d_local)
        pts_w = pa[None, :] + quat_m.rotate(qa[None, :], pts_l)
        seps = (pts_w - pb[None, :]) @ n_plane

        valid = jnp.arange(_PATCH) < cnt
        seps = jnp.where(valid, seps, 1e9)
        # Reduce to <= 4 SPREAD points (deepest / farthest / area
        # extremes, like box_box) — taking the 4 *deepest* of a flat
        # disc ring clusters them on one side and rocks the body in a
        # perpetual limit cycle.
        t1 = vec.any_orthonormal(n_plane)
        t2 = jnp.cross(n_plane, t1)
        uv = jnp.stack([pts_w @ t1, pts_w @ t2], axis=-1)
        fids = jnp.arange(_PATCH, dtype=jnp.int32)
        sel, ok = _reduce4(uv, seps, fids, cnt)
        p4 = pts_w[sel]
        s4 = seps[sel]
        return Manifold(
            normal=-n_plane,
            point_a=p4,
            point_b=p4 - n_plane[None, :] * s4[:, None],
            separation=jnp.where(ok, s4, 1e9),
            feature_id=jnp.where(ok, sel, 0).astype(jnp.int32),
            count=jnp.sum(ok.astype(jnp.int32)),
        )

    return pair_fn


# ---------------------------------------------------------------------------
# Convex hulls (vertex pools). ``prm`` = (offset, count, hx, hy, hz, flat,
# round_radius) into the world's shared vertex pool; support/patch take the
# pool as a third arg (wired by the dispatcher, which tags these with
# ``needs_pool``). A positive lane-6 radius makes the shape the Minkowski
# sum of the hull and a sphere — Parry's RoundShape (reference
# ``Collider::round_cuboid``, ``parry/mod.rs:763-777``): support grows by
# ``r * d_hat`` and contact patches lift by ``r`` along their face normal.
# ---------------------------------------------------------------------------

MAX_HULL_VERTS = 32


def _hull_verts(prm, pool):
    off = prm[0].astype(jnp.int32)
    cnt = prm[1].astype(jnp.int32)
    verts = jax.lax.dynamic_slice(pool, (off, 0), (MAX_HULL_VERTS, 3))
    valid = jnp.arange(MAX_HULL_VERTS) < cnt
    return verts, valid


def support_convex(prm, d, pool):
    verts, valid = _hull_verts(prm, pool)
    dots = jnp.where(valid, verts @ d, -1e30)
    return verts[jnp.argmax(dots)] + prm[6] * _nrm(d)


def closest_point_on_hull(prm, p, pool, iters=16):
    """Closest point of the INNER hull to local point ``p`` (Frank-Wolfe
    on min |x-p|^2; exact for interior points: converges to ``p``).
    Ignores the round radius — callers offset by ``prm[6]`` themselves."""
    verts, valid = _hull_verts(prm, pool)
    x = jnp.where(valid[:, None], verts, verts[0:1]).mean(axis=0)

    def body(x, _):
        g = x - p
        dots = jnp.where(valid, verts @ (-g), -1e30)
        s = verts[jnp.argmax(dots)]
        dxs = x - s
        gamma = jnp.clip(
            jnp.dot(g, dxs) / jnp.maximum(jnp.dot(dxs, dxs), 1e-12), 0.0, 1.0
        )
        return x - gamma * dxs, None

    x, _ = jax.lax.scan(body, x, None, length=iters)
    return x


def patch_convex(prm, d, pool):
    """Support face of the hull along ``d``, two-phase:

    1. collect candidates in a *loose* band (the iterated contact normal
       can be several degrees off the face normal, spreading the face's
       support values by ~face_width * sin(err)), fit the candidate ring's
       plane normal;
    2. re-collect with a *tight* band along that fitted normal — exact for
       flat faces even when ``d`` was noticeably off."""
    verts, valid = _hull_verts(prm, pool)
    dn = _nrm(d)
    size = jnp.maximum(jnp.max(prm[2:5]), 1e-3)

    def collect(axis, band):
        dots = jnp.where(valid, verts @ axis, -1e30)
        return dots, valid & (dots > jnp.max(dots) - band)

    # Phase 1: loose band, fit the candidate plane.
    _, near1 = collect(dn, 0.35 * size)
    k1 = jnp.sum(near1.astype(jnp.int32))
    sel = jnp.where(near1[:, None], verts, 0.0)
    c1 = jnp.sum(sel, axis=0) / jnp.maximum(k1.astype(jnp.float32), 1.0)
    # Plane normal via the candidate covariance's smallest direction —
    # cheap proxy: cross of the two longest centroid offsets.
    rel1 = jnp.where(near1[:, None], verts - c1, 0.0)
    ln = jnp.sum(rel1 * rel1, axis=-1)
    i_a = jnp.argmax(ln)
    cr = jnp.cross(rel1[i_a][None, :], rel1)
    i_b = jnp.argmax(jnp.sum(cr * cr, axis=-1))
    nf_fit = vec.normalize_or(jnp.cross(rel1[i_a], rel1[i_b]), dn)
    nf_fit = nf_fit * jnp.sign(vec.dot(nf_fit, dn) + 1e-12)
    axis2 = jnp.where(k1 >= 3, nf_fit, dn)

    # Phase 2: tight band along the fitted face normal.
    dots, near = collect(axis2, 0.02 * size)
    # If the tight pass degenerates (candidates were not coplanar), fall
    # back to the loose set along d.
    use2 = jnp.sum(near.astype(jnp.int32)) >= jnp.minimum(k1, 3)
    near = jnp.where(use2, near, near1)
    dots = jnp.where(use2, dots, jnp.where(valid, verts @ dn, -1e30))
    # A <=3-vertex "hull" (triangle/segment) IS its only face: the whole
    # vertex set is the patch no matter how far off ``d`` is (the flat
    # snap in the pair function relies on getting the true plane here).
    tiny = prm[1].astype(jnp.int32) <= 3
    near = jnp.where(tiny, valid, near)
    dots = jnp.where(tiny, jnp.where(valid, verts @ dn, -1e30), dots)

    score = jnp.where(near, dots, -jnp.inf)
    _, idx = jax.lax.top_k(score, _PATCH)
    sel_ok = near[idx]
    pts = verts[idx]
    k = jnp.minimum(jnp.sum(near.astype(jnp.int32)), _PATCH)

    # Angle-order the selected ring around its centroid.
    t1 = vec.any_orthonormal(dn)
    t2 = jnp.cross(dn, t1)
    centroid = jnp.sum(
        jnp.where(sel_ok[:, None], pts, 0.0), axis=0
    ) / jnp.maximum(k.astype(jnp.float32), 1.0)
    rel = pts - centroid
    ang = jnp.arctan2(rel @ t2, rel @ t1)
    ang = jnp.where(sel_ok, ang, 1e9)
    order = jnp.argsort(ang)
    pts = pts[order]
    # Degenerate-pad invalid slots with the first point.
    pad = jnp.arange(_PATCH) >= k
    pts = jnp.where(pad[:, None], pts[0:1], pts)

    # Face normal from the ring (sign-aligned with d); fall back to d.
    nf = jnp.cross(pts[1] - pts[0], pts[2] - pts[0])
    nf = vec.normalize_or(nf, dn)
    nf = nf * jnp.sign(vec.dot(nf, dn) + 1e-12)
    nf = jnp.where(k >= 3, nf, dn)
    # Round hulls: lift the inner-hull patch to the rounded surface.
    pts = pts + prm[6] * nf[None, :]
    return pts, nf, k


def _aux_wrap(fn):
    """Adapt a (prm, d) support/patch fn to the (prm, d, pool) calling
    convention used by pool-aware pair functions."""

    def wrapped(prm, d, pool):
        return fn(prm, d)

    return wrapped


def _convex_is_flat(prm):
    return prm[5] > 0.5


def generic_convex_pair_aux(support_a, patch_a, support_b, patch_b):
    """Like :func:`generic_convex_pair` but every support/patch fn takes
    ``(prm, d, pool)``; the built pair function takes the pool as its 7th
    argument (the dispatcher supplies ``world.convex_verts``). CONVEX
    shapes carry a flatness flag (triangles) in params lane 5."""

    def pair_fn(pa, qa, prm_a, pb, qb, prm_b, pool):
        base = generic_convex_pair(
            lambda prm, d: support_a(prm, d, pool),
            lambda prm, d: patch_a(prm, d, pool),
            lambda prm, d: support_b(prm, d, pool),
            lambda prm, d: patch_b(prm, d, pool),
            flat_a_fn=_convex_is_flat if support_a is support_convex else None,
            flat_b_fn=_convex_is_flat if support_b is support_convex else None,
        )
        return base(pa, qa, prm_a, pb, qb, prm_b)

    pair_fn.needs_pool = True
    return pair_fn


def support_patch_plane_pair_aux(support_fn, patch_fn):
    def pair_fn(pa, qa, prm_a, pb, qb, prm_b, pool):
        base = support_patch_plane_pair(
            lambda prm, d: support_fn(prm, d, pool),
            lambda prm, d: patch_fn(prm, d, pool),
        )
        return base(pa, qa, prm_a, pb, qb, prm_b)

    pair_fn.needs_pool = True
    return pair_fn
