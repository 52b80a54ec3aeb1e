"""Symmetric 3x3 tensors stored as ``[..., 6]`` = (xx, yy, zz, xy, xz, yz).

TPU-native counterpart of the reference's ``SymmetricTensor`` (used for
angular inertia, reference ``src/math/mod.rs:21-26``). Storing 6 floats keeps
the body SoA small and the HBM traffic low.
"""

import jax.numpy as jnp

XX, YY, ZZ, XY, XZ, YZ = 0, 1, 2, 3, 4, 5


def zero(shape=(), dtype=jnp.float32):
    return jnp.zeros(shape + (6,), dtype=dtype)


def identity(shape=(), dtype=jnp.float32):
    s = jnp.zeros(shape + (6,), dtype=dtype)
    return s.at[..., :3].set(1.0)


def from_diag(d):
    return jnp.concatenate([d, jnp.zeros_like(d)], axis=-1)


def diag(s):
    return s[..., :3]


def mv(s, v):
    """Matrix-vector product of the symmetric tensor with ``v``."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    rx = s[..., XX] * x + s[..., XY] * y + s[..., XZ] * z
    ry = s[..., XY] * x + s[..., YY] * y + s[..., YZ] * z
    rz = s[..., XZ] * x + s[..., YZ] * y + s[..., ZZ] * z
    return jnp.stack([rx, ry, rz], axis=-1)


def to_mat(s):
    row0 = jnp.stack([s[..., XX], s[..., XY], s[..., XZ]], axis=-1)
    row1 = jnp.stack([s[..., XY], s[..., YY], s[..., YZ]], axis=-1)
    row2 = jnp.stack([s[..., XZ], s[..., YZ], s[..., ZZ]], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def from_mat(m):
    return jnp.stack(
        [m[..., 0, 0], m[..., 1, 1], m[..., 2, 2],
         m[..., 0, 1], m[..., 0, 2], m[..., 1, 2]],
        axis=-1,
    )


def rotate(s, rot_mat):
    """Congruence transform ``R S R^T`` (world-space inertia from local).

    Elementwise contractions instead of matmul — see ``vec.mv3`` for why.
    """
    m = to_mat(s)
    # tmp = R @ S : tmp[i, j] = sum_k R[i, k] S[k, j]
    tmp = jnp.sum(rot_mat[..., :, :, None] * m[..., None, :, :], axis=-2)
    # out = tmp @ R^T : out[i, j] = sum_k tmp[i, k] R[j, k]
    out = jnp.sum(tmp[..., :, None, :] * rot_mat[..., None, :, :], axis=-1)
    return from_mat(out)


def inverse_or_zero(s):
    """Closed-form inverse via the adjugate; rows/cols that are all zero stay
    zero (mirrors the reference's inverse for locked/static inertia)."""
    a, b, c = s[..., XX], s[..., YY], s[..., ZZ]
    d, e, f = s[..., XY], s[..., XZ], s[..., YZ]
    # Cofactors.
    ca = b * c - f * f
    cb = a * c - e * e
    cc = a * b - d * d
    cd = e * f - d * c
    ce = d * f - e * b
    cf = d * e - a * f
    det = a * ca + d * cd + e * ce
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    out = jnp.stack([ca, cb, cc, cd, ce, cf], axis=-1) * inv_det[..., None]
    return out


def scale(s, k):
    return s * k[..., None]
