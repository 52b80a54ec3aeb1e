"""Per-shape AABBs and mass properties, vectorized over collider arrays.

Replaces Parry's ``compute_aabb`` / mass-property code that the reference
calls (``src/collision/collider/parry/mod.rs:447-523``,
``backend.rs:498`` AABB update). Dispatch over shape types uses
``jnp.select`` — every branch is a handful of element-wise ops, so computing
all and selecting is cheaper on TPU than real branching.
"""

import jax.numpy as jnp

from avian_tpu.core.types import ShapeType
from avian_tpu.math import quat as quat_m
from avian_tpu.math import sym3, vec

_PI = 3.14159265358979

# Half-extent used for "infinite" shapes (half-spaces). Colliders whose AABB
# reaches this are routed to the dense "global collider" broadphase pass
# instead of sweep-and-prune (see pipeline/broadphase.py).
BIG = 1.0e9


def local_aabb_half_extents(shape_type, params, custom_shapes=()):
    """Conservative local-frame AABB half extents ``f32[..., 3]``.

    ``custom_shapes``: static tuple of user shapes (see
    ``api/custom_shapes.py``); code ``CUSTOM_SHAPE_BASE + i`` uses shape
    ``i``'s ``aabb_half_extents(params)``."""
    r = params[..., 0]
    half = jnp.stack([r, r, r], axis=-1)  # sphere default

    cap_h, cap_r = params[..., 0], params[..., 1]
    capsule = jnp.stack([cap_r, cap_h + cap_r, cap_r], axis=-1)
    box = params[..., :3]
    plane = jnp.full(params.shape[:-1] + (3,), BIG, params.dtype)
    cyl = jnp.stack([cap_r, cap_h, cap_r], axis=-1)
    seg = jnp.stack(
        [params[..., 0], jnp.zeros_like(r), jnp.zeros_like(r)], axis=-1
    )
    convex = params[..., 2:5]  # precomputed local AABB half extents

    st = shape_type[..., None]
    conds = [
        st == ShapeType.SPHERE,
        st == ShapeType.CAPSULE,
        st == ShapeType.BOX,
        st == ShapeType.PLANE,
        st == ShapeType.CYLINDER,
        st == ShapeType.CONE,
        st == ShapeType.SEGMENT,
        st == ShapeType.CONVEX,
    ]
    vals = [half, capsule, box, plane, cyl, cyl, seg, convex]
    if custom_shapes:
        from avian_tpu.api.custom_shapes import CUSTOM_SHAPE_BASE

        import jax as _jax

        flat = params.reshape((-1, params.shape[-1]))
        for i, cs in enumerate(custom_shapes):
            conds.append(st == CUSTOM_SHAPE_BASE + i)
            vals.append(
                _jax.vmap(cs.aabb_half_extents)(flat).reshape(
                    params.shape[:-1] + (3,)
                )
            )
    return jnp.select(conds, vals, default=half)


def world_aabb(shape_type, params, pos, quat, custom_shapes=()):
    """World AABB via ``|R| @ h`` on the local box (exact for boxes,
    conservative for the rest; sphere handled exactly)."""
    h = local_aabb_half_extents(shape_type, params, custom_shapes)
    m = jnp.abs(quat_m.to_mat3(quat))
    world_h = vec.mv3(m, h)
    # Sphere AABB doesn't rotate.
    r = params[..., 0]
    sphere_h = jnp.stack([r, r, r], axis=-1)
    is_sphere = (shape_type == ShapeType.SPHERE)[..., None]
    world_h = jnp.where(is_sphere, sphere_h, world_h)
    return pos - world_h, pos + world_h


def mass_properties(shape_type, params, density):
    """(mass, local inertia tensor sym6, local COM) for each collider.

    Standard solid formulas (what bevy_heavy/Parry compute for the reference,
    ``parry/mod.rs:447-523``). COM is the shape's local origin for all
    currently supported primitives.
    """
    r = params[..., 0]
    zero = jnp.zeros_like(r)

    # Sphere
    m_sphere = density * (4.0 / 3.0) * _PI * r**3
    i_sphere = 0.4 * m_sphere * r * r
    i_sphere3 = jnp.stack([i_sphere, i_sphere, i_sphere], axis=-1)

    # Box
    hx, hy, hz = params[..., 0], params[..., 1], params[..., 2]
    m_box = density * 8.0 * hx * hy * hz
    i_box3 = (
        jnp.stack(
            [hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy], axis=-1
        )
        * (m_box / 3.0)[..., None]
    )

    # Capsule (axis Y): cylinder of height H=2h plus two hemispheres.
    ch, cr = params[..., 0], params[..., 1]
    H = 2.0 * ch
    m_cyl = density * _PI * cr * cr * H
    m_hemis = density * (4.0 / 3.0) * _PI * cr**3
    m_cap = m_cyl + m_hemis
    iy_cap = m_cyl * cr * cr * 0.5 + m_hemis * 0.4 * cr * cr
    ix_cap = (
        m_cyl * (H * H / 12.0 + cr * cr / 4.0)
        + m_hemis * (0.4 * cr * cr + H * H / 4.0 + 0.375 * H * cr)
    )
    i_cap3 = jnp.stack([ix_cap, iy_cap, ix_cap], axis=-1)

    # Cylinder (axis Y)
    m_cylinder = density * _PI * cr * cr * H
    iy_cyl = 0.5 * m_cylinder * cr * cr
    ix_cyl = m_cylinder * (3.0 * cr * cr + H * H) / 12.0
    i_cyl3 = jnp.stack([ix_cyl, iy_cyl, ix_cyl], axis=-1)

    # Cone (axis Y, about its center of mass)
    m_cone = density * _PI * cr * cr * H / 3.0
    iy_cone = 0.3 * m_cone * cr * cr
    ix_cone = m_cone * (3.0 / 20.0 * cr * cr + 3.0 / 80.0 * H * H)
    i_cone3 = jnp.stack([ix_cone, iy_cone, ix_cone], axis=-1)

    st = shape_type
    mass = jnp.select(
        [
            st == ShapeType.SPHERE,
            st == ShapeType.BOX,
            st == ShapeType.CAPSULE,
            st == ShapeType.CYLINDER,
            st == ShapeType.CONE,
        ],
        [m_sphere, m_box, m_cap, m_cylinder, m_cone],
        default=zero,
    )
    st3 = st[..., None]
    inertia3 = jnp.select(
        [
            st3 == ShapeType.SPHERE,
            st3 == ShapeType.BOX,
            st3 == ShapeType.CAPSULE,
            st3 == ShapeType.CYLINDER,
            st3 == ShapeType.CONE,
        ],
        [i_sphere3, i_box3, i_cap3, i_cyl3, i_cone3],
        default=jnp.zeros_like(i_box3),
    )
    # COM is the local origin for all primitives except the cone (base at
    # y=-h, apex at +h -> centroid at y=-h/2).
    com = jnp.zeros(params.shape[:-1] + (3,), params.dtype)
    cone_com = jnp.stack(
        [jnp.zeros_like(r), -0.5 * params[..., 0], jnp.zeros_like(r)],
        axis=-1,
    )
    com = jnp.where((st == ShapeType.CONE)[..., None], cone_com, com)
    return mass, sym3.from_diag(inertia3), com


def shift_inertia(inertia6, mass, offset):
    """Parallel-axis theorem: inertia about a point displaced by ``-offset``
    (i.e. move the reference point from the COM to COM + offset)."""
    d = offset
    d2 = jnp.sum(d * d, axis=-1)
    # I' = I + m (|d|^2 E - d d^T)
    shift = jnp.stack(
        [
            d2 - d[..., 0] * d[..., 0],
            d2 - d[..., 1] * d[..., 1],
            d2 - d[..., 2] * d[..., 2],
            -d[..., 0] * d[..., 1],
            -d[..., 0] * d[..., 2],
            -d[..., 1] * d[..., 2],
        ],
        axis=-1,
    )
    return inertia6 + shift * mass[..., None]
