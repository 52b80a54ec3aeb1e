"""Quaternion math on trailing-axis ``[..., 4]`` arrays, layout ``(x, y, z, w)``.

TPU-native counterpart of the reference's 3D ``Rotation(pub Quaternion)``
(reference ``src/physics_transform/transform.rs:745``). Identity is
``(0, 0, 0, 1)``. All ops broadcast over leading axes.
"""

import jax.numpy as jnp

from avian_tpu.math import vec


def identity(shape=(), dtype=jnp.float32):
    q = jnp.zeros(shape + (4,), dtype=dtype)
    return q.at[..., 3].set(1.0)


def from_xyzw(x, y, z, w):
    return jnp.stack([x, y, z, w], axis=-1)


def mul(q1, q2):
    """Hamilton product ``q1 * q2`` (apply q2 first, then q1)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def conj(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def rotate(q, v):
    """Rotate vector(s) ``v`` by quaternion(s) ``q``.

    Uses ``v' = v + 2 * cross(q.xyz, cross(q.xyz, v) + w*v)`` (9 mul fewer
    than the matrix form; this is what glam does internally).
    """
    u = q[..., :3]
    w = q[..., 3:4]
    t = jnp.cross(u, v) * 2.0
    return v + w * t + jnp.cross(u, t)


def rotate_inv(q, v):
    """Rotate ``v`` by the inverse of unit quaternion ``q``."""
    return rotate(conj(q), v)


def normalize(q):
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return q * jax_rsqrt(n2)


def jax_rsqrt(x):
    import jax.lax as lax

    return lax.rsqrt(jnp.maximum(x, 1e-30))


def from_scaled_axis(v):
    """Quaternion from a rotation vector (axis * angle).

    Matches glam's ``Quat::from_scaled_axis`` used by the reference's position
    integrator (``src/dynamics/integrator/mod.rs:529-531``). Branch-free small-
    angle handling: for tiny angles use the first-order Taylor expansion.
    """
    angle_sq = jnp.sum(v * v, axis=-1)
    angle = jnp.sqrt(jnp.maximum(angle_sq, 1e-30))
    small = angle_sq < 1e-12
    half = 0.5 * angle
    # sin(half)/angle, guarded. Taylor: 0.5 - angle^2/48.
    s = jnp.where(small, 0.5 - angle_sq / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - angle_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([v * s[..., None], w[..., None]], axis=-1)


def to_scaled_axis(q):
    """Rotation vector (axis * angle) from a quaternion — the inverse of
    :func:`from_scaled_axis`. Branch-free small-angle handling."""
    xyz = q[..., :3]
    w = q[..., 3]
    # Canonicalize to the short arc.
    sgn = jnp.where(w < 0.0, -1.0, 1.0)
    xyz = xyz * sgn[..., None]
    w = w * sgn
    s2 = jnp.sum(xyz * xyz, axis=-1)
    s = jnp.sqrt(jnp.maximum(s2, 1e-30))
    angle = 2.0 * jnp.arctan2(s, w)
    small = s2 < 1e-12
    # angle / sin(half) ~ 2 + angle^2/12 for small angles.
    scale = jnp.where(small, 2.0 + s2 / 1.5, angle / s)
    return xyz * scale[..., None]


def to_mat3(q):
    """Rotation matrix ``[..., 3, 3]`` from quaternion."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x2, y2, z2 = x + x, y + y, z + z
    xx, yy, zz = x * x2, y * y2, z * z2
    xy, xz, yz = x * y2, x * z2, y * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    m = jnp.stack(
        [
            1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def from_axis_angle(axis, angle):
    axis = jnp.asarray(axis, dtype=jnp.float32)
    angle = jnp.asarray(angle, dtype=jnp.float32)
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def fast_renormalize(q):
    """First-order renormalization (one Newton step), matching the reference's
    writeback path (``src/dynamics/solver/solver_body/plugin.rs:273``)."""
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return q * (0.5 * (3.0 - n2))
