"""User constraint extension point: XPBD correction helpers.

TPU-native counterpart of the reference's ``XpbdConstraint`` trait and its
``PositionConstraint``/``AngularConstraint`` helper traits
(``src/dynamics/solver/xpbd/mod.rs:23-52``,
``xpbd/positional_constraint.rs``, ``xpbd/angular_constraint.rs``).

A custom constraint is a static (hashable) object passed to
``physics_step(world, config, custom_joints=obj)`` with two methods:

- ``prepare(world, s, config) -> data``: called once per step. Compute and
  return any pre-step data as a pytree (anchors, rest lengths, Lagrange
  accumulators) — the counterpart of ``XpbdConstraint::prepare``.
- ``solve(s, data, h) -> (s, data)``: called every substep inside the
  position-solve window (after built-in joints, before the shared velocity
  projection). Mutate the ``SolverState`` with the helpers below — the
  counterpart of ``XpbdConstraint::solve``.

The helpers are vectorized over K constraint rows. Within one call, rows
sharing a dynamic body accumulate Jacobi-style (scatter-add); if your
constraint set has high per-body multiplicity, under-relax yourself or
split into multiple calls.

Example: ``examples/custom_constraint.py`` ports the reference's
``custom_constraint.rs`` (a center-distance constraint).
"""

import jax.numpy as jnp

from avian_tpu.math import quat as quat_m
from avian_tpu.math import sym3, vec
from avian_tpu.pipeline.solver_body import SolverState


def anchors_from_com(world, body, local_point):
    """World-space anchor vector from a body's COM at prepare time
    (``point_constraint.rs:44-49``): rotate ``local_point - com`` into
    world frame. Vectorized over leading axes."""
    b = world.bodies
    return quat_m.rotate(b.quat[body], local_point - b.com[body])


def center_difference(world, body_a, body_b):
    """World-space COM-to-COM vector at prepare time (the quantity the
    reference's ``custom_constraint.rs`` prepares)."""
    b = world.bodies
    com_a = b.pos[body_a] + quat_m.rotate(b.quat[body_a], b.com[body_a])
    com_b = b.pos[body_b] + quat_m.rotate(b.quat[body_b], b.com[body_b])
    return com_b - com_a


def current_separation(s: SolverState, body_a, body_b, r1, r2, center_diff):
    """Anchor separation under the current delta poses
    (``point_constraint.rs:53-70`` semantics): rotate the prepare-time
    anchors by each body's delta rotation and add the delta translations."""
    r1c = quat_m.rotate(s.delta_quat[body_a], r1)
    r2c = quat_m.rotate(s.delta_quat[body_b], r2)
    return (
        (s.delta_pos[body_b] - s.delta_pos[body_a]) + (r2c - r1c) + center_diff
    )


def apply_positional_correction(
    s: SolverState,
    body_a,
    body_b,
    r1,
    r2,
    correction,
    compliance,
    h,
    active=None,
):
    """Apply an XPBD positional correction ``correction`` (= C * dir, the
    violation vector to cancel) at world-space anchors ``r1``/``r2`` (from
    each COM, prepare-time frame; rotated by the current delta rotations
    internally). Mirrors ``positional_constraint.rs`` +
    ``xpbd/mod.rs:361-413``.

    Args are rank-1 over K constraints (``body_a`` i32[K], ``r1`` f32[K,3],
    ``correction`` f32[K,3], ``compliance`` f32[K] or scalar).
    Returns ``(s, delta_lagrange)`` with ``delta_lagrange`` f32[K] (scaled
    impulse magnitude, accumulate for force readback ``f = λ/h²``).
    """
    body_a = jnp.asarray(body_a, jnp.int32)
    body_b = jnp.asarray(body_b, jnp.int32)
    compliance = jnp.broadcast_to(
        jnp.asarray(compliance, jnp.float32), body_a.shape
    )
    if active is None:
        active = jnp.ones(body_a.shape, bool)

    c = vec.length(correction)
    ok = active & (c > 1e-9)
    dir_ = -correction / jnp.maximum(c, 1e-9)[..., None]

    r1c = quat_m.rotate(s.delta_quat[body_a], r1)
    r2c = quat_m.rotate(s.delta_quat[body_b], r2)

    ima = s.inv_mass[body_a]
    imb = s.inv_mass[body_b]
    iia = s.inv_inertia[body_a]
    iib = s.inv_inertia[body_b]

    r1xn = jnp.cross(r1c, dir_)
    r2xn = jnp.cross(r2c, dir_)
    w1 = jnp.max(ima, axis=-1) + vec.dot(r1xn, sym3.mv(iia, r1xn))
    w2 = jnp.max(imb, axis=-1) + vec.dot(r2xn, sym3.mv(iib, r2xn))
    w_sum = w1 + w2
    tilde = compliance / (h * h)
    delta_lagrange = jnp.where(
        ok & (w_sum > 1e-12), -c / jnp.maximum(w_sum + tilde, 1e-12), 0.0
    )
    impulse = delta_lagrange[..., None] * dir_

    d_pos_a = impulse * ima
    d_pos_b = -impulse * imb
    rv_a = sym3.mv(iia, jnp.cross(r1c, impulse))
    rv_b = -sym3.mv(iib, jnp.cross(r2c, impulse))

    m = ok[..., None]
    delta_pos = (
        s.delta_pos
        .at[body_a].add(jnp.where(m, d_pos_a, 0.0))
        .at[body_b].add(jnp.where(m, d_pos_b, 0.0))
    )
    rot_acc = (
        jnp.zeros_like(s.delta_pos)
        .at[body_a].add(jnp.where(m, rv_a, 0.0))
        .at[body_b].add(jnp.where(m, rv_b, 0.0))
    )
    delta_quat = quat_m.mul(quat_m.from_scaled_axis(rot_acc), s.delta_quat)
    return s.replace(delta_pos=delta_pos, delta_quat=delta_quat), delta_lagrange


def apply_angular_correction(
    s: SolverState, body_a, body_b, difference, compliance, h, active=None
):
    """Apply an XPBD angular correction cancelling the rotation vector
    ``difference`` between two bodies (``angular_constraint.rs:112-149``,
    e.g. ``difference = a1 × a2`` aligns two axes). Returns
    ``(s, delta_lagrange)`` (f32[K])."""
    body_a = jnp.asarray(body_a, jnp.int32)
    body_b = jnp.asarray(body_b, jnp.int32)
    compliance = jnp.broadcast_to(
        jnp.asarray(compliance, jnp.float32), body_a.shape
    )
    if active is None:
        active = jnp.ones(body_a.shape, bool)

    angle = vec.length(difference)
    ok = active & (angle > 1e-9)
    axis = difference / jnp.maximum(angle, 1e-9)[..., None]

    iia = s.inv_inertia[body_a]
    iib = s.inv_inertia[body_b]
    w1 = vec.dot(axis, sym3.mv(iia, axis))
    w2 = vec.dot(axis, sym3.mv(iib, axis))
    w_sum = w1 + w2
    tilde = compliance / (h * h)
    delta_lagrange = jnp.where(
        ok & (w_sum > 1e-12), -angle / jnp.maximum(w_sum + tilde, 1e-12), 0.0
    )
    impulse = -delta_lagrange[..., None] * axis
    rv_a = sym3.mv(iia, impulse)
    rv_b = -sym3.mv(iib, impulse)

    m = ok[..., None]
    rot_acc = (
        jnp.zeros_like(s.delta_pos)
        .at[body_a].add(jnp.where(m, rv_a, 0.0))
        .at[body_b].add(jnp.where(m, rv_b, 0.0))
    )
    delta_quat = quat_m.mul(quat_m.from_scaled_axis(rot_acc), s.delta_quat)
    return s.replace(delta_quat=delta_quat), delta_lagrange
