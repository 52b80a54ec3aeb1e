"""Semi-implicit (symplectic) Euler integration.

Counterpart of the reference's ``IntegratorPlugin``
(``src/dynamics/integrator/mod.rs``): per-step precomputed velocity
increments, damping as ``1/(1 + h*c)``, gyroscopic torque with
momentum-magnitude clamping, velocity clamping, and delta-pose position
integration inside the substep loop.
"""

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp

from avian_tpu.core import types
from avian_tpu.core.config import PhysicsConfig
from avian_tpu.core.state import Bodies
from avian_tpu.math import quat as quat_m
from avian_tpu.math import sym3, vec
from avian_tpu.pipeline.solver_body import (
    SolverState,
    locked_rotation_mask,
    locked_translation_mask,
    world_inv_inertia,
)


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass(frozen=True)
class VelocityIncrements:
    """Per-substep velocity increments + damping factors, computed once per
    step (reference ``VelocityIntegrationData``, ``integrator/mod.rs:216``)."""

    lin_inc: jnp.ndarray          # [N, 3] velocity increment per substep
    ang_inc: jnp.ndarray          # [N, 3]
    lin_damping_rhs: jnp.ndarray  # [N]
    ang_damping_rhs: jnp.ndarray  # [N]


def pre_process_velocity_increments(
    bodies: Bodies, gravity, h: float
) -> VelocityIncrements:
    """Compute per-substep velocity increments from gravity, accumulated and
    constant forces/torques/accelerations (reference
    ``pre_process_velocity_increments`` ``integrator/mod.rs:260-313`` +
    ``ForcePlugin`` ``forces/plugin.rs:96-243``)."""
    dynamic = (bodies.body_type == types.BodyType.DYNAMIC) & bodies.active

    tmask = locked_translation_mask(bodies.locked_axes)
    rmask = locked_rotation_mask(bodies.locked_axes)

    # Linear acceleration: gravity * scale + F * inv_mass + const accels.
    force = (
        bodies.force
        + bodies.const_force
        + quat_m.rotate(bodies.quat, bodies.const_local_force)
    )
    lin_acc = (
        gravity[None, :] * bodies.gravity_scale[:, None]
        + force * bodies.inv_mass[:, None]
        + bodies.const_lin_acc
        + quat_m.rotate(bodies.quat, bodies.const_local_lin_acc)
    )

    # Angular acceleration: I_world^-1 * torque + const angular accels.
    torque = (
        bodies.torque
        + bodies.const_torque
        + quat_m.rotate(bodies.quat, bodies.const_local_torque)
    )
    inv_i_world = world_inv_inertia(bodies)
    ang_acc = (
        sym3.mv(inv_i_world, torque)
        + bodies.const_ang_acc
        + quat_m.rotate(bodies.quat, bodies.const_local_ang_acc)
    )

    d1 = dynamic[:, None]
    lin_inc = jnp.where(d1, lin_acc * tmask * h, 0.0)
    ang_inc = jnp.where(d1, ang_acc * rmask * h, 0.0)

    return VelocityIncrements(
        lin_inc=lin_inc,
        ang_inc=ang_inc,
        lin_damping_rhs=1.0 / (1.0 + h * bodies.lin_damping),
        ang_damping_rhs=1.0 / (1.0 + h * bodies.ang_damping),
    )


def integrate_velocities(
    s: SolverState, inc: VelocityIncrements, bodies: Bodies, dt: float
) -> SolverState:
    """One substep of velocity integration (reference
    ``integrate_velocities`` ``integrator/mod.rs:343-400``).

    ``dt`` here is the *full step* dt used by the gyroscopic term (the
    reference passes ``Time`` = substep time inside the substep loop; we pass
    the substep dt from the caller).
    """
    is_dyn = (
        (bodies.body_type == types.BodyType.DYNAMIC)
        & bodies.active
        & ~bodies.sleeping
    )
    d1 = is_dyn[:, None]

    lin_vel = jnp.where(
        d1, s.lin_vel * inc.lin_damping_rhs[:, None] + inc.lin_inc, s.lin_vel
    )
    ang_vel = jnp.where(
        d1, s.ang_vel * inc.ang_damping_rhs[:, None] + inc.ang_inc, s.ang_vel
    )

    # Gyroscopic torque for flagged bodies (integrator/mod.rs:403-463).
    gyro = is_dyn & bodies.gyroscopic
    rot = quat_m.mul(s.delta_quat, bodies.quat)
    ang_vel_gyro = solve_gyroscopic_torque(
        ang_vel, rot, bodies.inv_inertia, dt
    )
    ang_vel = jnp.where(gyro[:, None], ang_vel_gyro, ang_vel)

    return s.replace(lin_vel=lin_vel, ang_vel=ang_vel)


def solve_gyroscopic_torque(ang_vel, rot_quat, local_inv_inertia6, dt):
    """Semi-implicit Euler gyroscopic update with angular-momentum-magnitude
    clamping (reference ``solve_gyroscopic_torque``,
    ``integrator/mod.rs:403-463``, Jolt-inspired)."""
    local_w = quat_m.rotate_inv(rot_quat, ang_vel)
    # Local inertia tensor = inverse of the stored inverse (padded bodies have
    # zero inverse -> zero tensor -> zero momentum; handled by the guard).
    local_inertia = sym3.inverse_or_zero(local_inv_inertia6)
    local_momentum = sym3.mv(local_inertia, local_w)
    new_momentum = local_momentum - dt * jnp.cross(local_w, local_momentum)
    new_sq = vec.length_sq(new_momentum)
    scale = jnp.where(
        new_sq > 0.0,
        jnp.sqrt(vec.length_sq(local_momentum) / jnp.maximum(new_sq, 1e-30)),
        0.0,
    )
    new_momentum = new_momentum * scale[..., None]
    new_local_w = sym3.mv(local_inv_inertia6, new_momentum)
    return quat_m.rotate(rot_quat, new_local_w)


def clamp_velocities(s: SolverState, bodies: Bodies) -> SolverState:
    """Clamp to MaxLinearSpeed / MaxAngularSpeed
    (``integrator/mod.rs:467-500``)."""
    lin = vec.clamp_length_max(s.lin_vel, bodies.max_lin_speed)
    ang = vec.clamp_length_max(s.ang_vel, bodies.max_ang_speed)
    return s.replace(lin_vel=lin, ang_vel=ang)


def integrate_positions(s: SolverState, h: float) -> SolverState:
    """Advance delta pose by velocities (``integrate_positions``,
    ``integrator/mod.rs:503-535``)."""
    delta_pos = s.delta_pos + s.lin_vel * h
    dq = quat_m.from_scaled_axis(s.ang_vel * h)
    delta_quat = quat_m.mul(dq, s.delta_quat)
    return s.replace(delta_pos=delta_pos, delta_quat=delta_quat)
