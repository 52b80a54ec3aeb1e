"""Fixed-timestep render interpolation.

Counterpart of the reference's ``PhysicsInterpolationPlugin``
(``src/interpolation.rs``, delegating to bevy_transform_interpolation):
rendering between two fixed-timestep snapshots. Here it's a pure function of
two body states + blend factor; extrapolation variants included.
"""

import jax.numpy as jnp

from avian_tpu.math import quat as quat_m


def nlerp(q0, q1, t):
    """Normalized quaternion lerp (shortest path)."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0.0, -q1, q1)
    return quat_m.normalize(q0 + (q1 - q0) * t)


def interpolate_poses(bodies_prev, bodies_next, alpha: float):
    """Blend positions/rotations of two snapshots for rendering
    (alpha in [0, 1]: fraction of the fixed timestep elapsed)."""
    pos = bodies_prev.pos + (bodies_next.pos - bodies_prev.pos) * alpha
    quat = nlerp(bodies_prev.quat, bodies_next.quat, alpha)
    return pos, quat


def extrapolate_poses(bodies, dt: float):
    """Extrapolate poses forward by ``dt`` using current velocities
    (the reference's extrapolation mode)."""
    pos = bodies.pos + bodies.lin_vel * dt
    dq = quat_m.from_scaled_axis(bodies.ang_vel * dt)
    quat = quat_m.normalize(quat_m.mul(dq, bodies.quat))
    return pos, quat


def hermite_interpolate_poses(bodies_prev, bodies_next, alpha, dt: float):
    """Velocity-aware cubic Hermite interpolation
    (``interpolation.rs:138-149``, ``TransformHermiteEasing``): unlike
    lerp/nlerp, uses the endpoint velocities, producing smooth trajectories
    at low tick rates and correct >pi-per-step spins (where nlerp would
    take the short way around).

    Translation: standard cubic Hermite on positions with the endpoint
    linear velocities as tangents. Rotation: Hermite on the rotation
    vector from the previous orientation, with the endpoint angular
    velocities as tangents and the net relative rotation as the midspan —
    the same formulation bevy_transform_interpolation's Hermite easing
    uses. ``dt`` is the fixed timestep between the snapshots.
    """
    t = jnp.asarray(alpha, jnp.float32)
    t2 = t * t
    t3 = t2 * t
    h00 = 2.0 * t3 - 3.0 * t2 + 1.0
    h10 = t3 - 2.0 * t2 + t
    h01 = -2.0 * t3 + 3.0 * t2
    h11 = t3 - t2

    pos = (
        h00 * bodies_prev.pos
        + h10 * dt * bodies_prev.lin_vel
        + h01 * bodies_next.pos
        + h11 * dt * bodies_next.lin_vel
    )

    # Relative rotation as a rotation vector (q_next = exp(r) * q_prev).
    q0 = bodies_prev.quat
    q1 = bodies_next.quat
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1s = jnp.where(dot < 0.0, -q1, q1)
    rel = quat_m.mul(q1s, quat_m.conj(q0))
    rel_w = jnp.clip(rel[..., 3:4], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(rel_w)
    s = jnp.sqrt(jnp.maximum(1.0 - rel_w * rel_w, 1e-12))
    axis = rel[..., :3] / s
    r = jnp.where(angle > 1e-6, axis * angle, 2.0 * rel[..., :3])

    theta = (
        h10 * dt * bodies_prev.ang_vel
        + h01 * r
        + h11 * dt * bodies_next.ang_vel
    )
    quat = quat_m.normalize(
        quat_m.mul(quat_m.from_scaled_axis(theta), q0)
    )
    return pos, quat


# ---------------------------------------------------------------------------
# 2D profile (scalar rotation angles; ``avian_tpu.dim2``)
# ---------------------------------------------------------------------------


def interpolate_poses_2d(bodies_prev, bodies_next, alpha: float):
    """2D snapshot blend: linear on positions, shortest-arc on angles."""
    pos = bodies_prev.pos + (bodies_next.pos - bodies_prev.pos) * alpha
    d = bodies_next.angle - bodies_prev.angle
    d = jnp.mod(d + jnp.pi, 2.0 * jnp.pi) - jnp.pi  # shortest arc
    return pos, bodies_prev.angle + d * alpha


def extrapolate_poses_2d(bodies, dt: float):
    """2D velocity extrapolation."""
    return bodies.pos + bodies.lin_vel * dt, bodies.angle + bodies.ang_vel * dt


def hermite_interpolate_poses_2d(bodies_prev, bodies_next, alpha, dt: float):
    """2D cubic Hermite with endpoint velocities as tangents
    (``interpolation.rs:138-149`` on the avian2d profile); the angle span
    uses the raw (unwrapped) delta so >pi-per-step spins interpolate the
    long way the motion actually took."""
    t = jnp.asarray(alpha, jnp.float32)
    t2 = t * t
    t3 = t2 * t
    h00 = 2.0 * t3 - 3.0 * t2 + 1.0
    h10 = t3 - 2.0 * t2 + t
    h01 = -2.0 * t3 + 3.0 * t2
    h11 = t3 - t2
    pos = (
        h00 * bodies_prev.pos
        + h10 * dt * bodies_prev.lin_vel
        + h01 * bodies_next.pos
        + h11 * dt * bodies_next.lin_vel
    )
    angle = (
        h00 * bodies_prev.angle
        + h10 * dt * bodies_prev.ang_vel
        + h01 * bodies_next.angle
        + h11 * dt * bodies_next.ang_vel
    )
    return pos, angle
