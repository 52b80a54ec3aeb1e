"""2D rotations as unit complex numbers ``[..., 2]`` = (cos, sin).

Counterpart of the reference's 2D ``Rotation { cos, sin }``
(``src/physics_transform/transform.rs:175-183``).
"""

import jax.numpy as jnp


def identity(shape=(), dtype=jnp.float32):
    r = jnp.zeros(shape + (2,), dtype=dtype)
    return r.at[..., 0].set(1.0)


def from_angle(theta):
    return jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


def angle(r):
    return jnp.arctan2(r[..., 1], r[..., 0])


def mul(r1, r2):
    c = r1[..., 0] * r2[..., 0] - r1[..., 1] * r2[..., 1]
    s = r1[..., 1] * r2[..., 0] + r1[..., 0] * r2[..., 1]
    return jnp.stack([c, s], axis=-1)


def inv(r):
    return jnp.stack([r[..., 0], -r[..., 1]], axis=-1)


def rotate(r, v):
    c, s = r[..., 0], r[..., 1]
    x = c * v[..., 0] - s * v[..., 1]
    y = s * v[..., 0] + c * v[..., 1]
    return jnp.stack([x, y], axis=-1)


def rotate_inv(r, v):
    return rotate(inv(r), v)


def normalize(r):
    n2 = jnp.sum(r * r, axis=-1, keepdims=True)
    import jax.lax as lax

    return r * lax.rsqrt(jnp.maximum(n2, 1e-30))
