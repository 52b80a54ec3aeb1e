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
