"""2D user constraint extension point: XPBD correction helpers.

The avian2d compile of the reference's ``XpbdConstraint`` trait helpers
(``xpbd/positional_constraint.rs``, ``xpbd/angular_constraint.rs``) on the
[N,2] profile; mirrors the 3D ``avian_tpu/api/custom.py`` with scalar
angles. A custom constraint is a static object passed to
``physics_step_2d(world, config, custom_joints=obj)`` with
``prepare(world, s, config) -> data`` and ``solve(s, data, h) -> (s, data)``
methods; ``s`` is a :class:`~avian_tpu.dim2.dynamics.SolverState2D`.
"""

import jax.numpy as jnp

from avian_tpu.dim2.narrowphase import rot, rotate


def _cross2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def anchors_from_com(world, body, local_point):
    """World-space anchor vector from a body's COM at prepare time."""
    b = world.bodies
    c, s = rot(b.angle[body])
    return rotate(c, s, jnp.asarray(local_point, jnp.float32) - b.com[body])


def center_difference(world, body_a, body_b):
    """World-space COM-to-COM vector at prepare time."""
    b = world.bodies
    ca, sa = rot(b.angle[body_a])
    cb, sb = rot(b.angle[body_b])
    com_a = b.pos[body_a] + rotate(ca, sa, b.com[body_a])
    com_b = b.pos[body_b] + rotate(cb, sb, b.com[body_b])
    return com_b - com_a


def current_separation(s, body_a, body_b, r1, r2, center_diff):
    """Anchor separation under the current delta poses."""
    ca, sa = rot(s.delta_angle[body_a])
    cb, sb = rot(s.delta_angle[body_b])
    r1c = rotate(ca, sa, r1)
    r2c = rotate(cb, sb, r2)
    return (
        (s.delta_pos[body_b] - s.delta_pos[body_a]) + (r2c - r1c) + center_diff
    )


def apply_positional_correction(
    s, body_a, body_b, r1, r2, correction, compliance, h, active=None
):
    """Apply an XPBD positional correction (= C * dir, the violation
    vector to cancel) at anchors ``r1``/``r2`` (from each COM,
    prepare-time frame). Rank-1 over K constraints; returns
    ``(s, delta_lagrange)``."""
    body_a = jnp.asarray(body_a, jnp.int32)
    body_b = jnp.asarray(body_b, jnp.int32)
    compliance = jnp.broadcast_to(
        jnp.asarray(compliance, jnp.float32), body_a.shape
    )
    if active is None:
        active = jnp.ones(body_a.shape, bool)

    c = jnp.linalg.norm(correction, axis=-1)
    ok = active & (c > 1e-9)
    dir_ = -correction / jnp.maximum(c, 1e-9)[..., None]

    ca, sa = rot(s.delta_angle[body_a])
    cb, sb = rot(s.delta_angle[body_b])
    r1c = rotate(ca, sa, r1)
    r2c = rotate(cb, sb, r2)

    ima = s.inv_mass[body_a]
    imb = s.inv_mass[body_b]
    iia = s.inv_inertia[body_a]
    iib = s.inv_inertia[body_b]

    r1xn = _cross2(r1c, dir_)
    r2xn = _cross2(r2c, dir_)
    w1 = jnp.max(ima, axis=-1) + iia * r1xn * r1xn
    w2 = jnp.max(imb, axis=-1) + iib * r2xn * r2xn
    w_sum = w1 + w2
    tilde = compliance / (h * h)
    delta_lagrange = jnp.where(
        ok & (w_sum > 1e-12), -c / jnp.maximum(w_sum + tilde, 1e-12), 0.0
    )
    impulse = delta_lagrange[..., None] * dir_

    d_pos_a = impulse * ima
    d_pos_b = -impulse * imb
    dth_a = iia * _cross2(r1c, impulse)
    dth_b = -iib * _cross2(r2c, impulse)

    m = ok[..., None]
    delta_pos = (
        s.delta_pos
        .at[body_a].add(jnp.where(m, d_pos_a, 0.0))
        .at[body_b].add(jnp.where(m, d_pos_b, 0.0))
    )
    delta_angle = (
        s.delta_angle
        .at[body_a].add(jnp.where(ok, dth_a, 0.0))
        .at[body_b].add(jnp.where(ok, dth_b, 0.0))
    )
    return (
        s.replace(delta_pos=delta_pos, delta_angle=delta_angle),
        delta_lagrange,
    )


def apply_angular_correction(
    s, body_a, body_b, difference, compliance, h, active=None
):
    """Apply an XPBD angular correction cancelling the (scalar) angle
    ``difference`` between two bodies. Returns ``(s, delta_lagrange)``."""
    body_a = jnp.asarray(body_a, jnp.int32)
    body_b = jnp.asarray(body_b, jnp.int32)
    compliance = jnp.broadcast_to(
        jnp.asarray(compliance, jnp.float32), body_a.shape
    )
    if active is None:
        active = jnp.ones(body_a.shape, bool)

    angle = jnp.abs(difference)
    sign = jnp.sign(difference)
    ok = active & (angle > 1e-9)

    iia = s.inv_inertia[body_a]
    iib = s.inv_inertia[body_b]
    w_sum = iia + iib
    tilde = compliance / (h * h)
    delta_lagrange = jnp.where(
        ok & (w_sum > 1e-12), -angle / jnp.maximum(w_sum + tilde, 1e-12), 0.0
    )
    impulse = -delta_lagrange * sign
    delta_angle = (
        s.delta_angle
        .at[body_a].add(jnp.where(ok, iia * impulse, 0.0))
        .at[body_b].add(jnp.where(ok, -iib * impulse, 0.0))
    )
    return s.replace(delta_angle=delta_angle), delta_lagrange
