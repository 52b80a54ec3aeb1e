"""Unit tests for analytic pair manifolds (called directly, no jit)."""

import numpy as np
import jax.numpy as jnp

from avian_tpu.geometry import narrowphase as nf
from avian_tpu.math import quat

ID = jnp.asarray([0.0, 0.0, 0.0, 1.0])
Z4 = jnp.zeros(4)


def _prm(*vals):
    p = np.zeros(4, np.float32)
    p[: len(vals)] = vals
    return jnp.asarray(p)


def test_sphere_sphere_penetrating():
    m = nf.sphere_sphere(
        jnp.asarray([0.0, 0.0, 0.0]), ID, _prm(1.0),
        jnp.asarray([1.5, 0.0, 0.0]), ID, _prm(1.0),
    )
    assert int(m.count) == 1
    np.testing.assert_allclose(np.asarray(m.normal), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(float(m.separation[0]), -0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.point_a[0]), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.point_b[0]), [0.5, 0, 0], atol=1e-6)


def test_sphere_plane():
    m = nf.sphere_plane(
        jnp.asarray([0.0, 0.3, 0.0]), ID, _prm(0.5),
        jnp.zeros(3), ID, _prm(0.0, 1.0, 0.0),
    )
    np.testing.assert_allclose(float(m.separation[0]), -0.2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.normal), [0, -1, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.point_a[0]), [0, -0.2, 0], atol=1e-6)


def test_box_plane_flat():
    m = nf.box_plane(
        jnp.asarray([0.0, 0.4, 0.0]), ID, _prm(0.5, 0.5, 0.5),
        jnp.zeros(3), ID, _prm(0.0, 1.0, 0.0),
    )
    assert int(m.count) == 4
    seps = np.sort(np.asarray(m.separation))
    np.testing.assert_allclose(seps[:4], [-0.1] * 4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.normal), [0, -1, 0], atol=1e-6)
    # All 4 contact points are bottom corners.
    pts = np.asarray(m.point_a)
    np.testing.assert_allclose(pts[:, 1], [-0.1] * 4, atol=1e-6)


def test_sphere_box_outside_and_inside():
    # Outside, closest to +X face.
    m = nf.sphere_box(
        jnp.asarray([1.5, 0.0, 0.0]), ID, _prm(0.4),
        jnp.zeros(3), ID, _prm(0.5, 0.5, 0.5),
    )
    np.testing.assert_allclose(float(m.separation[0]), 0.6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.normal), [-1, 0, 0], atol=1e-5)
    # Deep overlap.
    m = nf.sphere_box(
        jnp.asarray([0.6, 0.0, 0.0]), ID, _prm(0.4),
        jnp.zeros(3), ID, _prm(0.5, 0.5, 0.5),
    )
    np.testing.assert_allclose(float(m.separation[0]), -0.3, atol=1e-5)


def test_capsule_plane_two_points():
    # Capsule lying along X (rotate local Y axis onto X): penetrating 0.1.
    q = quat.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(-np.pi / 2))
    m = nf.capsule_plane(
        jnp.asarray([0.0, 0.4, 0.0]), q, _prm(1.0, 0.5),
        jnp.zeros(3), ID, _prm(0.0, 1.0, 0.0),
    )
    assert int(m.count) == 2
    np.testing.assert_allclose(np.asarray(m.separation[:2]), [-0.1, -0.1], atol=1e-5)


def test_box_box_face_stack():
    # Two unit boxes stacked with 0.05 overlap: 4-point face manifold.
    m = nf.box_box(
        jnp.asarray([0.0, 0.0, 0.0]), ID, _prm(0.5, 0.5, 0.5),
        jnp.asarray([0.0, 0.95, 0.0]), ID, _prm(0.5, 0.5, 0.5),
    )
    assert int(m.count) == 4
    np.testing.assert_allclose(np.abs(np.asarray(m.normal)), [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.separation), [-0.05] * 4, atol=1e-5)


def test_box_box_rotated_45():
    # Top box rotated 45 deg about Y: clip produces up to 8 pts -> 4 kept.
    q = quat.from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray(np.pi / 4))
    m = nf.box_box(
        jnp.asarray([0.0, 0.0, 0.0]), ID, _prm(0.5, 0.5, 0.5),
        jnp.asarray([0.0, 0.95, 0.0]), q, _prm(0.5, 0.5, 0.5),
    )
    assert int(m.count) == 4
    np.testing.assert_allclose(np.abs(np.asarray(m.normal)), [0, 1, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(m.separation), [-0.05] * 4, atol=1e-4)


def test_box_box_edge_contact():
    # Box rotated 45 deg about Z resting its edge on the other box's top
    # face is still a face contact; a true edge-edge case: two boxes rotated
    # 45 deg about different axes crossing like an X.
    qa = quat.from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray(np.pi / 4))
    qb = quat.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(np.pi / 4))
    ha = np.sqrt(2) * 0.5
    m = nf.box_box(
        jnp.asarray([0.0, 0.0, 0.0]), qa, _prm(0.5, 0.5, 0.5),
        jnp.asarray([0.0, 2 * ha - 0.02, 0.0]), qb, _prm(0.5, 0.5, 0.5),
    )
    assert int(m.count) >= 1
    n = np.asarray(m.normal)
    assert n[1] > 0.9  # pushes up
    assert float(m.separation[0]) < 0.0


def test_box_box_separated_speculative():
    m = nf.box_box(
        jnp.asarray([0.0, 0.0, 0.0]), ID, _prm(0.5, 0.5, 0.5),
        jnp.asarray([0.0, 1.2, 0.0]), ID, _prm(0.5, 0.5, 0.5),
    )
    # Separated by 0.2: manifold still reports points with positive sep.
    assert int(m.count) >= 1
    np.testing.assert_allclose(
        np.asarray(m.separation[: int(m.count)]), 0.2, atol=1e-4
    )


def test_capsule_capsule_parallel():
    q = quat.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(np.pi / 2))
    m = nf.capsule_capsule(
        jnp.asarray([0.0, 0.0, 0.0]), q, _prm(1.0, 0.3),
        jnp.asarray([0.5, 0.5, 0.0]), q, _prm(1.0, 0.3),
    )
    assert int(m.count) == 2
    np.testing.assert_allclose(float(m.separation[0]), -0.1, atol=1e-5)


def test_dispatch_swaps():
    # plane-sphere (reversed order) must flip the normal.
    m = nf.compute_manifold(
        jnp.asarray(3), jnp.zeros(3), ID, _prm(0.0, 1.0, 0.0),
        jnp.asarray(0), jnp.asarray([0.0, 0.3, 0.0]), ID, _prm(0.5),
    )
    np.testing.assert_allclose(np.asarray(m.normal), [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(float(m.separation[0]), -0.2, atol=1e-6)


def test_sphere_segment_manifold():
    """Sphere resting over the middle of a segment on the X axis
    (``Collider::segment``, parry/mod.rs:817)."""
    m = nf.compute_manifold(
        jnp.asarray(0), jnp.asarray([0.2, 0.4, 0.0]), ID, _prm(0.5),
        jnp.asarray(6), jnp.zeros(3), ID, _prm(2.0),
    )
    assert int(m.count) >= 1
    i = int(np.argmin(np.asarray(m.separation)))
    np.testing.assert_allclose(float(m.separation[i]), -0.1, atol=2e-2)
    # Normal from sphere toward the segment: -Y.
    np.testing.assert_allclose(np.asarray(m.normal), [0, -1, 0], atol=0.05)


def test_box_segment_manifold():
    """Box resting on a segment running under its bottom face."""
    m = nf.compute_manifold(
        jnp.asarray(2), jnp.asarray([0.0, 0.45, 0.0]), ID, _prm(0.5, 0.5, 0.5),
        jnp.asarray(6), jnp.zeros(3), ID, _prm(3.0),
    )
    assert int(m.count) >= 1
    sep = np.asarray(m.separation)[: int(m.count)]
    assert sep.min() < -0.02  # penetrating by ~0.05
    np.testing.assert_allclose(np.asarray(m.normal), [0, -1, 0], atol=0.05)
