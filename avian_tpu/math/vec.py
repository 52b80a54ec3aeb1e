"""Vector helpers over trailing-axis arrays.

All functions take arrays whose last axis is the vector dimension and
broadcast over leading axes, so they can be used inside ``vmap`` or on whole
SoA columns at once.
"""

import jax.numpy as jnp

_EPS = 1e-12


def dot(a, b):
    """Dot product along the last axis."""
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    """3D cross product along the last axis."""
    return jnp.cross(a, b)


def cross2(a, b):
    """2D scalar cross product ``a.x*b.y - a.y*b.x``."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def perp2(a):
    """2D perpendicular ``(-y, x)``."""
    return jnp.stack([-a[..., 1], a[..., 0]], axis=-1)


def length_sq(a):
    return jnp.sum(a * a, axis=-1)


def length(a):
    return jnp.sqrt(length_sq(a))


def normalize_or_zero(a):
    """Normalize; returns zero vector where the input norm is ~0."""
    n2 = length_sq(a)
    inv = jnp.where(n2 > _EPS, 1.0 / jnp.sqrt(jnp.maximum(n2, _EPS)), 0.0)
    return a * inv[..., None]


def normalize_or(a, fallback):
    """Normalize; returns `fallback` where the input norm is ~0."""
    n2 = length_sq(a)
    ok = n2 > _EPS
    inv = jnp.where(ok, 1.0 / jnp.sqrt(jnp.maximum(n2, _EPS)), 0.0)
    return jnp.where(ok[..., None], a * inv[..., None], fallback)


def clamp_length_max(a, max_len):
    """Clamp the vector length to at most ``max_len`` (broadcasts)."""
    n2 = length_sq(a)
    max2 = max_len * max_len
    scale = jnp.where(n2 > max2, max_len / jnp.sqrt(jnp.maximum(n2, _EPS)), 1.0)
    return a * scale[..., None]


def any_orthonormal(n):
    """A unit vector orthogonal to unit vector ``n`` (3D).

    Branch-free version of glam's ``any_orthonormal_vector`` (used by the
    reference for friction tangents, ``src/dynamics/solver/contact/mod.rs:445``).
    Uses the Pixar orthonormal-basis construction (Duff et al. 2017).
    """
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    return t


def mv3(m, v):
    """3x3 matrix-vector product via elementwise ops (``[..., 3, 3] @ [..., 3]``).

    Written without ``dot_general`` on purpose: XLA lowers tiny matmuls to
    reduced-precision MXU passes on some platforms, while elementwise
    multiply-adds stay full f32 on the VPU and fuse with neighbors.
    """
    return jnp.sum(m * v[..., None, :], axis=-1)


def mtv3(m, v):
    """Transposed 3x3 matrix-vector product (``m^T @ v``)."""
    return jnp.sum(m * v[..., :, None], axis=-2)


def safe_recip(x):
    """1/x, returning 0 where x == 0 (matches the reference's
    ``recip_or_zero``, used for effective masses)."""
    return jnp.where(x != 0.0, 1.0 / jnp.where(x == 0.0, 1.0, x), 0.0)
