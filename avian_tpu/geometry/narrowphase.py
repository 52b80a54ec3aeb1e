"""Analytic primitive-pair contact manifolds (3D), vectorized over pairs.

TPU-native replacement for Parry's ``contact_manifolds`` dispatcher that the
reference delegates all narrowphase math to
(``src/collision/collider/parry/contact_query.rs:156-261``). Every pair
function is branch-free (masks/selects instead of control flow) and returns a
fixed-size 4-point manifold, so the whole pair buffer evaluates as one fused
vector program under ``vmap``.

Conventions:
- Poses are world (pos, quat) of the *collider* (body pose composed with the
  collider's local offset upstream).
- ``normal`` points from shape A toward shape B (matches the reference's
  manifold convention, ``contact/normal_part.rs:60``).
- ``separation`` is negative when penetrating (= -penetration).
- Pair functions are written for canonical type order ``type_a <= type_b``
  (so e.g. the plane is always shape B); the dispatcher swaps and flips.
"""

from dataclasses import dataclass, fields

import numpy as _np

import jax
import jax.numpy as jnp

from avian_tpu.core.types import ShapeType
from avian_tpu.math import quat as quat_m
from avian_tpu.math import vec

MAX_POINTS = 4
# NOTE: module-level constants MUST be numpy, not jnp: a device-array
# constant captured into a jitted program permanently degrades the TPU
# runtime's dispatch path (measured ~100x on every subsequent kernel
# launch). Host numpy constants fold into HLO literals and are safe.
_X = _np.asarray([1.0, 0.0, 0.0], _np.float32)


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass(frozen=True)
class Manifold:
    """A fixed-capacity contact manifold for one collider pair."""

    normal: jnp.ndarray      # f32[3] world, from A to B
    point_a: jnp.ndarray     # f32[4, 3] world point on A's surface
    point_b: jnp.ndarray     # f32[4, 3] world point on B's surface
    separation: jnp.ndarray  # f32[4] (negative = penetration)
    feature_id: jnp.ndarray  # i32[4] stable id for warm-start matching
    count: jnp.ndarray       # i32[] number of valid points


def _empty() -> Manifold:
    return Manifold(
        normal=jnp.asarray(_X),
        point_a=jnp.zeros((4, 3), jnp.float32),
        point_b=jnp.zeros((4, 3), jnp.float32),
        separation=jnp.full((4,), 1e9, jnp.float32),
        feature_id=jnp.zeros((4,), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


def _one_point(normal, pa, pb, sep, fid=0) -> Manifold:
    m = _empty()
    return Manifold(
        normal=normal,
        point_a=m.point_a.at[0].set(pa),
        point_b=m.point_b.at[0].set(pb),
        separation=m.separation.at[0].set(sep),
        feature_id=m.feature_id.at[0].set(fid),
        count=jnp.ones((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Pair functions. Each takes (pos_a, quat_a, params_a, pos_b, quat_b,
# params_b) -> Manifold. Written for a single pair; vmapped by the caller.
# ---------------------------------------------------------------------------


def sphere_sphere(pa, qa, prm_a, pb, qb, prm_b) -> Manifold:
    ra, rb = prm_a[0], prm_b[0]
    d = pb - pa
    dist = vec.length(d)
    n = vec.normalize_or(d, _X)
    return _one_point(n, pa + n * ra, pb - n * rb, dist - (ra + rb))


def sphere_capsule(pa, qa, prm_a, pb, qb, prm_b) -> Manifold:
    ra = prm_a[0]
    hb, rb = prm_b[0], prm_b[1]
    axis = quat_m.rotate(qb, jnp.asarray([0.0, 1.0, 0.0], jnp.float32))
    # Closest point on B's segment to the sphere center.
    t = jnp.clip(jnp.dot(pa - pb, axis), -hb, hb)
    c = pb + axis * t
    d = c - pa
    dist = vec.length(d)
    n = vec.normalize_or(d, _X)
    return _one_point(n, pa + n * ra, c - n * rb, dist - (ra + rb))


def capsule_capsule(pa, qa, prm_a, pb, qb, prm_b) -> Manifold:
    ha, ra = prm_a[0], prm_a[1]
    hb, rb = prm_b[0], prm_b[1]
    ua = quat_m.rotate(qa, jnp.asarray([0.0, 1.0, 0.0], jnp.float32))
    ub = quat_m.rotate(qb, jnp.asarray([0.0, 1.0, 0.0], jnp.float32))
    s, t = _closest_segment_segment(pa, ua, ha, pb, ub, hb)
    ca = pa + ua * s
    cb = pb + ub * t
    d = cb - ca
    dist = vec.length(d)
    n = vec.normalize_or(d, _X)
    m1 = _one_point(n, ca + n * ra, cb - n * rb, dist - (ra + rb))

    # Parallel capsules: add a second point to support stable lying-down
    # stacking (Parry produces a 2-point manifold there too).
    parallel = jnp.abs(jnp.dot(ua, ub)) > 0.999
    # Project B's segment onto A's axis, take overlap interval endpoints.
    tb0 = jnp.dot((pb - ub * hb) - pa, ua)
    tb1 = jnp.dot((pb + ub * hb) - pa, ua)
    lo = jnp.maximum(-ha, jnp.minimum(tb0, tb1))
    hi = jnp.minimum(ha, jnp.maximum(tb0, tb1))
    has_overlap = parallel & (hi > lo)
    mid0, mid1 = lo, hi
    ca0 = pa + ua * mid0
    ca1 = pa + ua * mid1
    # Perpendicular offset from A's axis to B's axis.
    perp = (pb - pa) - ua * jnp.dot(pb - pa, ua)
    pdist = vec.length(perp)
    np_ = vec.normalize_or(perp, vec.any_orthonormal(ua))
    sep_par = pdist - (ra + rb)
    m2 = Manifold(
        normal=np_,
        point_a=m1.point_a.at[0].set(ca0 + np_ * ra).at[1].set(ca1 + np_ * ra),
        point_b=m1.point_b.at[0].set(ca0 + perp - np_ * rb).at[1].set(
            ca1 + perp - np_ * rb
        ),
        separation=m1.separation.at[0].set(sep_par).at[1].set(sep_par),
        feature_id=m1.feature_id.at[0].set(1).at[1].set(2),
        count=jnp.asarray(2, jnp.int32),
    )
    return jax.tree.map(
        lambda a, b: jnp.where(has_overlap, b, a), m1, m2
    )


def _closest_segment_segment(pa, ua, ha, pb, ub, hb):
    """Closest points parameters (s, t) between segments ``pa + ua*s`` and
    ``pb + ub*t`` with s in [-ha, ha], t in [-hb, hb]. Ericson RTCD 5.1.9,
    branch-free."""
    r = pa - pb
    a = 1.0  # dot(ua, ua)
    e = 1.0  # dot(ub, ub)
    b = jnp.dot(ua, ub)
    c = jnp.dot(ua, r)
    f = jnp.dot(ub, r)
    denom = a * e - b * b  # >= 0
    s = jnp.where(denom > 1e-9, jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-9), -ha, ha), 0.0)
    t = (b * s + f) / e
    t_cl = jnp.clip(t, -hb, hb)
    s = jnp.clip((b * t_cl - c) / a, -ha, ha)
    return s, t_cl


def sphere_box(pa, qa, prm_a, pb, qb, prm_b) -> Manifold:
    """Sphere A vs box B."""
    ra = prm_a[0]
    h = prm_b[:3]
    c_local = quat_m.rotate_inv(qb, pa - pb)
    q = jnp.clip(c_local, -h, h)
    delta = c_local - q
    d2 = vec.length_sq(delta)
    outside = d2 > 1e-12

    # Outside: normal from box surface toward sphere center.
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    n_out = delta / dist

    # Inside: push out along the axis of least penetration.
    face_dist = h - jnp.abs(c_local)  # >= 0 inside
    ax = jnp.argmin(face_dist)
    sign = jnp.where(c_local[ax] >= 0.0, 1.0, -1.0)
    n_in = jnp.zeros(3, jnp.float32).at[ax].set(sign)
    depth_in = face_dist[ax]

    n_local = jnp.where(outside, n_out, n_in)
    sep = jnp.where(outside, dist - ra, -(depth_in + ra))
    q_surf = jnp.where(outside, q, c_local + n_in * depth_in)

    n_world = quat_m.rotate(qb, n_local)  # points from box toward sphere
    normal = -n_world  # from A (sphere) toward B (box)
    p_on_sphere = pa + normal * ra
    p_on_box = pb + quat_m.rotate(qb, q_surf)
    return _one_point(normal, p_on_sphere, p_on_box, sep)


def sphere_plane(pa, qa, prm_a, pb, qb, prm_b) -> Manifold:
    """Sphere A vs half-space B (plane local normal in prm_b[:3])."""
    ra = prm_a[0]
    n = quat_m.rotate(qb, prm_b[:3])  # outward plane normal
    s = jnp.dot(pa - pb, n)
    sep = s - ra
    normal = -n  # from sphere toward the plane
    return _one_point(normal, pa + normal * ra, pa - n * s, sep)


def capsule_plane(pa, qa, prm_a, pb, qb, prm_b) -> Manifold:
    ha, ra = prm_a[0], prm_a[1]
    n = quat_m.rotate(qb, prm_b[:3])
    axis = quat_m.rotate(qa, jnp.asarray([0.0, 1.0, 0.0], jnp.float32))
    e0 = pa - axis * ha
    e1 = pa + axis * ha
    s0 = jnp.dot(e0 - pb, n) - ra
    s1 = jnp.dot(e1 - pb, n) - ra
    normal = -n
    m = _empty()
    pa0 = e0 + normal * ra
    pa1 = e1 + normal * ra
    return Manifold(
        normal=normal,
        point_a=m.point_a.at[0].set(pa0).at[1].set(pa1),
        point_b=m.point_b.at[0].set(pa0 - n * s0).at[1].set(pa1 - n * s1),
        separation=m.separation.at[0].set(s0).at[1].set(s1),
        feature_id=m.feature_id.at[0].set(0).at[1].set(1),
        count=jnp.asarray(2, jnp.int32),
    )


_BOX_CORNERS = _np.asarray(
    [
        [-1.0, -1.0, -1.0],
        [1.0, -1.0, -1.0],
        [-1.0, 1.0, -1.0],
        [1.0, 1.0, -1.0],
        [-1.0, -1.0, 1.0],
        [1.0, -1.0, 1.0],
        [-1.0, 1.0, 1.0],
        [1.0, 1.0, 1.0],
    ],
    _np.float32,
)


def box_plane(pa, qa, prm_a, pb, qb, prm_b) -> Manifold:
    """Box A vs half-space B: the 4 deepest corners below the plane."""
    h = prm_a[:3]
    n = quat_m.rotate(qb, prm_b[:3])
    corners = pa + quat_m.rotate(qa[None, :], _BOX_CORNERS * h[None, :])
    seps = jnp.sum(corners * n[None, :], axis=-1) - jnp.dot(pb, n)
    # Take the 4 smallest separations (deepest), deterministic order.
    order = jnp.argsort(seps)
    idx = order[:4]
    sep4 = seps[idx]
    p4 = corners[idx]
    normal = -n
    return Manifold(
        normal=normal,
        point_a=p4,
        point_b=p4 - n[None, :] * sep4[:, None],
        separation=sep4,
        feature_id=idx.astype(jnp.int32),
        count=jnp.asarray(4, jnp.int32),
    )


# (A dedicated capsule-box sampler used to live here; CAPSULE x BOX is
# dispatched to the generic support-map path below, which handles the
# resting/leaning cases it was written for.)


# box_box lives in its own module (SAT + clipping).
from avian_tpu.geometry.box_box import box_box  # noqa: E402

# Generic support-mapped convex pairs (GJK/MPR-free fixed-iteration path,
# replacing Parry's support-map dispatch ``contact_query.rs:190-225``).
from avian_tpu.geometry import convex as _cx  # noqa: E402

_SHAPE_SUPPORT = {
    ShapeType.SPHERE: (_cx.support_sphere, _cx.patch_sphere),
    ShapeType.CAPSULE: (_cx.support_capsule, _cx.patch_capsule),
    ShapeType.BOX: (_cx.support_box, _cx.patch_box),
    ShapeType.CYLINDER: (_cx.support_cylinder, _cx.patch_cylinder),
    ShapeType.CONE: (_cx.support_cone, _cx.patch_cone),
    ShapeType.SEGMENT: (_cx.support_segment, _cx.patch_segment),
}


def _generic(ta, tb):
    sa, fa = _SHAPE_SUPPORT[ta]
    sb, fb = _SHAPE_SUPPORT[tb]
    return _cx.generic_convex_pair(sa, fa, sb, fb)


def _generic_convex(ta):
    """Pair of shape ``ta`` vs a convex hull (pool-aware)."""
    if ta == ShapeType.CONVEX:
        sa, fa = _cx.support_convex, _cx.patch_convex
    else:
        s0, f0 = _SHAPE_SUPPORT[ta]
        sa, fa = _cx._aux_wrap(s0), _cx._aux_wrap(f0)
    return _cx.generic_convex_pair_aux(
        sa, fa, _cx.support_convex, _cx.patch_convex
    )


def _swapped(fn):
    def wrapper(pa, qa, prm_a, pb, qb, prm_b):
        m = fn(pb, qb, prm_b, pa, qa, prm_a)
        return Manifold(
            normal=-m.normal,
            point_a=m.point_b,
            point_b=m.point_a,
            separation=m.separation,
            feature_id=m.feature_id,
            count=m.count,
        )

    return wrapper


def _swapped_aux(fn):
    def wrapper(pa, qa, prm_a, pb, qb, prm_b, pool):
        m = fn(pb, qb, prm_b, pa, qa, prm_a, pool)
        return Manifold(
            normal=-m.normal,
            point_a=m.point_b,
            point_b=m.point_a,
            separation=m.separation,
            feature_id=m.feature_id,
            count=m.count,
        )

    wrapper.needs_pool = True
    return wrapper


def _unsupported(pa, qa, prm_a, pb, qb, prm_b) -> Manifold:
    return _empty()


# Canonical dispatch table over (type_a <= type_b) pairs. Inputs are
# canonicalized (swapped) BEFORE the switch so each pair function appears
# exactly once — under vmap, lax.switch evaluates every branch on the whole
# pair buffer, so duplicate swapped branches would double the narrowphase
# cost (box-box in particular).
_CANONICAL = [
    (ShapeType.SPHERE, ShapeType.SPHERE, sphere_sphere),
    (ShapeType.SPHERE, ShapeType.CAPSULE, sphere_capsule),
    (ShapeType.SPHERE, ShapeType.BOX, sphere_box),
    (ShapeType.SPHERE, ShapeType.PLANE, sphere_plane),
    (ShapeType.SPHERE, ShapeType.CYLINDER, _generic(ShapeType.SPHERE, ShapeType.CYLINDER)),
    (ShapeType.SPHERE, ShapeType.CONE, _generic(ShapeType.SPHERE, ShapeType.CONE)),
    (ShapeType.CAPSULE, ShapeType.CAPSULE, capsule_capsule),
    (ShapeType.CAPSULE, ShapeType.BOX, _generic(ShapeType.CAPSULE, ShapeType.BOX)),
    (ShapeType.CAPSULE, ShapeType.PLANE, capsule_plane),
    (ShapeType.CAPSULE, ShapeType.CYLINDER, _generic(ShapeType.CAPSULE, ShapeType.CYLINDER)),
    (ShapeType.CAPSULE, ShapeType.CONE, _generic(ShapeType.CAPSULE, ShapeType.CONE)),
    (ShapeType.BOX, ShapeType.BOX, box_box),
    (ShapeType.BOX, ShapeType.PLANE, box_plane),
    (ShapeType.BOX, ShapeType.CYLINDER, _generic(ShapeType.BOX, ShapeType.CYLINDER)),
    (ShapeType.BOX, ShapeType.CONE, _generic(ShapeType.BOX, ShapeType.CONE)),
    (ShapeType.PLANE, ShapeType.CYLINDER,
     _swapped(_cx.support_patch_plane_pair(_cx.support_cylinder, _cx.patch_cylinder))),
    (ShapeType.PLANE, ShapeType.CONE,
     _swapped(_cx.support_patch_plane_pair(_cx.support_cone, _cx.patch_cone))),
    (ShapeType.CYLINDER, ShapeType.CYLINDER, _generic(ShapeType.CYLINDER, ShapeType.CYLINDER)),
    (ShapeType.CYLINDER, ShapeType.CONE, _generic(ShapeType.CYLINDER, ShapeType.CONE)),
    (ShapeType.CONE, ShapeType.CONE, _generic(ShapeType.CONE, ShapeType.CONE)),
    (ShapeType.SPHERE, ShapeType.SEGMENT, _generic(ShapeType.SPHERE, ShapeType.SEGMENT)),
    (ShapeType.CAPSULE, ShapeType.SEGMENT, _generic(ShapeType.CAPSULE, ShapeType.SEGMENT)),
    (ShapeType.BOX, ShapeType.SEGMENT, _generic(ShapeType.BOX, ShapeType.SEGMENT)),
    (ShapeType.PLANE, ShapeType.SEGMENT,
     _swapped(_cx.support_patch_plane_pair(_cx.support_segment, _cx.patch_segment))),
    (ShapeType.CYLINDER, ShapeType.SEGMENT, _generic(ShapeType.CYLINDER, ShapeType.SEGMENT)),
    (ShapeType.CONE, ShapeType.SEGMENT, _generic(ShapeType.CONE, ShapeType.SEGMENT)),
    (ShapeType.SEGMENT, ShapeType.SEGMENT, _generic(ShapeType.SEGMENT, ShapeType.SEGMENT)),
    (ShapeType.SEGMENT, ShapeType.CONVEX, _generic_convex(ShapeType.SEGMENT)),
    (ShapeType.SPHERE, ShapeType.CONVEX, _generic_convex(ShapeType.SPHERE)),
    (ShapeType.CAPSULE, ShapeType.CONVEX, _generic_convex(ShapeType.CAPSULE)),
    (ShapeType.BOX, ShapeType.CONVEX, _generic_convex(ShapeType.BOX)),
    (ShapeType.PLANE, ShapeType.CONVEX,
     _swapped_aux(_cx.support_patch_plane_pair_aux(
         _cx.support_convex, _cx.patch_convex))),
    (ShapeType.CYLINDER, ShapeType.CONVEX, _generic_convex(ShapeType.CYLINDER)),
    (ShapeType.CONE, ShapeType.CONVEX, _generic_convex(ShapeType.CONE)),
    (ShapeType.CONVEX, ShapeType.CONVEX, _generic_convex(ShapeType.CONVEX)),
]

# sphere, capsule, box, plane, cylinder, cone, (segment, triangle), convex
_NUM_DISPATCH_TYPES = 9

# LUT: canonical (ta, tb) code -> branch index; unsupported -> last branch.

_LUT = _np.full(_NUM_DISPATCH_TYPES * _NUM_DISPATCH_TYPES, len(_CANONICAL), _np.int32)
for _i, (_ta, _tb, _) in enumerate(_CANONICAL):
    _LUT[int(_ta) * _NUM_DISPATCH_TYPES + int(_tb)] = _i
# (indexed with tracers inside compute_manifold via jnp.asarray there)


def _custom_entries(custom_shapes):
    """Dispatch entries for user :class:`CustomShape`s (codes
    ``CUSTOM_SHAPE_BASE + i``) — the counterpart of the reference's
    ``NarrowPhasePlugin<CustomCollider>`` registration
    (``src/collision/narrow_phase/mod.rs:62``, ``custom_collider.rs``).
    Every custom shape is a support function, so all its pairs route
    through the generic support-map pipeline."""
    from avian_tpu.api.custom_shapes import CUSTOM_SHAPE_BASE

    entries = []
    for i, cs in enumerate(custom_shapes):
        code = CUSTOM_SHAPE_BASE + i
        sup, pat = cs.support, cs.patch_fn()
        for bt, (sb, fb) in _SHAPE_SUPPORT.items():
            entries.append(
                (int(bt), code, _cx.generic_convex_pair(sb, fb, sup, pat))
            )
        entries.append(
            (
                int(ShapeType.PLANE),
                code,
                _swapped(_cx.support_patch_plane_pair(sup, pat)),
            )
        )
        entries.append(
            (
                int(ShapeType.CONVEX),
                code,
                _cx.generic_convex_pair_aux(
                    _cx.support_convex,
                    _cx.patch_convex,
                    _cx._aux_wrap(sup),
                    _cx._aux_wrap(pat),
                ),
            )
        )
        for j, cs2 in enumerate(custom_shapes[: i + 1]):
            entries.append(
                (
                    CUSTOM_SHAPE_BASE + j,
                    code,
                    _cx.generic_convex_pair(
                        cs2.support, cs2.patch_fn(), sup, pat
                    ),
                )
            )
    return entries


def compute_manifold(
    type_a, pa, qa, prm_a, type_b, pb, qb, prm_b, shape_pairs=None,
    convex_verts=None, custom_shapes=(),
) -> Manifold:
    """Shape-pair dispatch for one pair (vmap over the pair buffer).

    ``shape_pairs``: optional static tuple of canonical (ta, tb) pairs the
    scene can produce — only those branches are lowered (see
    ``PhysicsConfig.shape_pairs``).

    ``custom_shapes``: static tuple of user :class:`CustomShape`s; shape
    code ``CUSTOM_SHAPE_BASE + index`` dispatches to its support/patch
    functions via the generic support-map pair pipeline.
    """
    swap = type_a > type_b
    ta = jnp.where(swap, type_b, type_a)
    tb = jnp.where(swap, type_a, type_b)
    pa_, pb_ = jnp.where(swap, pb, pa), jnp.where(swap, pa, pb)
    qa_, qb_ = jnp.where(swap, qb, qa), jnp.where(swap, qa, qb)
    prm_a_, prm_b_ = jnp.where(swap, prm_b, prm_a), jnp.where(swap, prm_a, prm_b)

    if custom_shapes:
        from avian_tpu.api.custom_shapes import CUSTOM_SHAPE_BASE

        num_types = CUSTOM_SHAPE_BASE + len(custom_shapes)
        table = _CANONICAL + _custom_entries(custom_shapes)
    else:
        num_types = _NUM_DISPATCH_TYPES
        table = _CANONICAL

    if shape_pairs is None and not custom_shapes:
        entries = _CANONICAL
        lut = jnp.asarray(_LUT)  # inside-trace: folds to an HLO literal
    else:
        if shape_pairs is None:
            entries = table
        else:
            allowed = {(int(a), int(b)) for (a, b) in shape_pairs}
            entries = [
                (a, b, fn) for (a, b, fn) in table if (int(a), int(b)) in allowed
            ]
        lut = _np.full(num_types * num_types, len(entries), _np.int32)
        for i, (a, b, _) in enumerate(entries):
            lut[int(a) * num_types + int(b)] = i
        lut = jnp.asarray(lut)

    # Pool for CONVEX branches, padded so the fixed-size vertex slice is
    # always in bounds (branches are only reachable when hulls exist, but
    # lax.switch lowers every listed branch).
    from avian_tpu.geometry.convex import MAX_HULL_VERTS

    pool = (
        convex_verts
        if convex_verts is not None
        else jnp.zeros((1, 3), jnp.float32)
    )
    pool = jnp.concatenate(
        [pool, jnp.zeros((MAX_HULL_VERTS, 3), jnp.float32)], axis=0
    )
    branches = [
        (
            (lambda args, fn=fn: fn(*args, pool))
            if getattr(fn, "needs_pool", False)
            else (lambda args, fn=fn: fn(*args))
        )
        for (_, _, fn) in entries
    ] + [lambda args: _unsupported(*args)]
    code = lut[
        jnp.clip(ta * num_types + tb, 0, num_types * num_types - 1)
    ]
    m = jax.lax.switch(code, branches, (pa_, qa_, prm_a_, pb_, qb_, prm_b_))
    # Un-swap: flip the normal and exchange witness points.
    return Manifold(
        normal=jnp.where(swap, -m.normal, m.normal),
        point_a=jnp.where(swap, m.point_b, m.point_a),
        point_b=jnp.where(swap, m.point_a, m.point_b),
        separation=m.separation,
        feature_id=m.feature_id,
        count=m.count,
    )
