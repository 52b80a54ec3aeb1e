import numpy as np
import jax.numpy as jnp

from avian_tpu.math import quat, sym3, vec, rot2


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(16, 4)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    v = rng.normal(size=(16, 3)).astype(np.float32)
    out = np.asarray(quat.rotate(jnp.asarray(q), jnp.asarray(v)))
    m = np.asarray(quat.to_mat3(jnp.asarray(q)))
    expected = np.einsum("nij,nj->ni", m, v)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_quat_mul_compose():
    qx = np.asarray(quat.from_axis_angle(jnp.asarray([1.0, 0, 0]), jnp.asarray(0.3)))
    qy = np.asarray(quat.from_axis_angle(jnp.asarray([0, 1.0, 0]), jnp.asarray(0.5)))
    v = jnp.asarray([0.2, -1.0, 0.7])
    a = quat.rotate(jnp.asarray(qx), quat.rotate(jnp.asarray(qy), v))
    b = quat.rotate(quat.mul(jnp.asarray(qx), jnp.asarray(qy)), v)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_from_scaled_axis_small_angle():
    v = jnp.asarray([1e-8, 0.0, 0.0])
    q = quat.from_scaled_axis(v)
    np.testing.assert_allclose(np.asarray(q), [5e-9, 0, 0, 1.0], atol=1e-7)
    # Large angle agrees with axis-angle.
    v = jnp.asarray([0.0, 1.3, 0.0])
    q = quat.from_scaled_axis(v)
    q2 = quat.from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray(1.3))
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-6)


def test_quat_inverse_rotate():
    q = quat.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(0.7))
    v = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(quat.rotate_inv(q, quat.rotate(q, v))), [1, 2, 3], atol=1e-5
    )


def test_sym3_matvec_and_inverse():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(3, 3)).astype(np.float32)
    m = a @ a.T + 3 * np.eye(3, dtype=np.float32)  # SPD
    s = sym3.from_mat(jnp.asarray(m))
    v = jnp.asarray([0.5, -1.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(sym3.mv(s, v)), m @ np.asarray(v), rtol=1e-4
    )
    inv = sym3.inverse_or_zero(s)
    np.testing.assert_allclose(
        np.asarray(sym3.mv(inv, sym3.mv(s, v))), np.asarray(v), rtol=1e-3, atol=1e-4
    )
    # Zero tensor inverts to zero.
    np.testing.assert_allclose(
        np.asarray(sym3.inverse_or_zero(sym3.zero())), np.zeros(6)
    )


def test_sym3_rotate_congruence():
    rng = np.random.default_rng(2)
    m = np.diag([1.0, 2.0, 3.0]).astype(np.float32)
    q = rng.normal(size=4).astype(np.float32)
    q /= np.linalg.norm(q)
    r = np.asarray(quat.to_mat3(jnp.asarray(q)))
    s = sym3.rotate(sym3.from_diag(jnp.asarray([1.0, 2.0, 3.0])), jnp.asarray(r))
    np.testing.assert_allclose(
        np.asarray(sym3.to_mat(s)), r @ m @ r.T, atol=1e-5
    )


def test_vec_helpers():
    np.testing.assert_allclose(
        np.asarray(vec.normalize_or_zero(jnp.zeros(3))), np.zeros(3)
    )
    n = jnp.asarray([0.0, 1.0, 0.0])
    t = vec.any_orthonormal(n)
    assert abs(float(vec.dot(t, n))) < 1e-6
    assert abs(float(vec.length(t)) - 1.0) < 1e-5
    v = vec.clamp_length_max(jnp.asarray([3.0, 4.0, 0.0]), jnp.asarray(2.5))
    np.testing.assert_allclose(float(vec.length(v)), 2.5, rtol=1e-5)


def test_rot2():
    r = rot2.from_angle(jnp.asarray(0.6))
    v = jnp.asarray([1.0, 0.0])
    out = rot2.rotate(r, v)
    np.testing.assert_allclose(
        np.asarray(out), [np.cos(0.6), np.sin(0.6)], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(rot2.rotate_inv(r, out)), [1.0, 0.0], atol=1e-6
    )
