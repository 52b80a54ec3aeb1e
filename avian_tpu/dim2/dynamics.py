"""2D solver bodies + semi-implicit Euler integration.

2D profile of ``pipeline/solver_body.py`` + ``pipeline/integrator.py``
(reference ``SolverBody`` 2D layout, ``solver_body/mod.rs:49-54``: the 2D
solver body is 32 bytes — delta pos 2, delta angle 1, velocities 3; no
gyroscopic term in 2D).
"""

from dataclasses import dataclass, fields, replace

import jax
import jax.numpy as jnp

from avian_tpu.core import types
from avian_tpu.dim2.narrowphase import rot, rotate
from avian_tpu.dim2.state import (
    LOCK_ROT,
    LOCK_TX,
    LOCK_TY,
    Bodies2D,
)


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass(frozen=True)
class SolverState2D:
    lin_vel: jnp.ndarray      # [N, 2]
    ang_vel: jnp.ndarray      # [N]
    delta_pos: jnp.ndarray    # [N, 2]
    delta_angle: jnp.ndarray  # [N]
    inv_mass: jnp.ndarray     # [N, 2] per-axis (locked-axis-masked)
    inv_inertia: jnp.ndarray  # [N] scalar
    solve_mask: jnp.ndarray   # f32[N]

    def replace(self, **kw):
        return replace(self, **kw)


def prepare(bodies: Bodies2D) -> SolverState2D:
    n = bodies.capacity
    dynamic = bodies.body_type == types.BodyType.DYNAMIC
    moving = bodies.active & ~bodies.sleeping & (
        bodies.body_type != types.BodyType.STATIC
    )
    responds = dynamic & moving

    tmask = jnp.stack(
        [
            jnp.where(bodies.locked_axes & LOCK_TX > 0, 0.0, 1.0),
            jnp.where(bodies.locked_axes & LOCK_TY > 0, 0.0, 1.0),
        ],
        axis=-1,
    )
    rmask = jnp.where(bodies.locked_axes & LOCK_ROT > 0, 0.0, 1.0)

    inv_mass = jnp.where(
        responds[:, None], bodies.inv_mass[:, None] * tmask, 0.0
    )
    inv_inertia = jnp.where(responds, bodies.inv_inertia * rmask, 0.0)

    vel_mask = moving
    return SolverState2D(
        lin_vel=jnp.where(vel_mask[:, None], bodies.lin_vel, 0.0),
        ang_vel=jnp.where(vel_mask, bodies.ang_vel, 0.0),
        delta_pos=jnp.zeros((n, 2), jnp.float32),
        delta_angle=jnp.zeros((n,), jnp.float32),
        inv_mass=inv_mass,
        inv_inertia=inv_inertia,
        solve_mask=responds.astype(jnp.float32),
    )


def writeback(bodies: Bodies2D, s: SolverState2D) -> Bodies2D:
    """Apply delta pose rotating about the COM
    (``solver_body/plugin.rs:255-284``)."""
    c0, s0 = rot(bodies.angle)
    old_world_com = rotate(c0, s0, bodies.com)
    new_angle = bodies.angle + s.delta_angle
    c1, s1 = rot(new_angle)
    new_world_com = rotate(c1, s1, bodies.com)
    new_pos = bodies.pos + s.delta_pos + old_world_com - new_world_com

    moving = bodies.active & ~bodies.sleeping & (
        bodies.body_type != types.BodyType.STATIC
    )
    m1 = moving[:, None]
    return bodies.replace(
        pos=jnp.where(m1, new_pos, bodies.pos),
        angle=jnp.where(moving, new_angle, bodies.angle),
        lin_vel=jnp.where(m1, s.lin_vel, bodies.lin_vel),
        ang_vel=jnp.where(moving, s.ang_vel, bodies.ang_vel),
    )


@_register
@dataclass(frozen=True)
class VelocityIncrements2D:
    lin_inc: jnp.ndarray          # [N, 2]
    ang_inc: jnp.ndarray          # [N]
    lin_damping_rhs: jnp.ndarray  # [N]
    ang_damping_rhs: jnp.ndarray  # [N]


def pre_process_velocity_increments(
    bodies: Bodies2D, gravity, h: float
) -> VelocityIncrements2D:
    dynamic = (bodies.body_type == types.BodyType.DYNAMIC) & bodies.active
    tmask = jnp.stack(
        [
            jnp.where(bodies.locked_axes & LOCK_TX > 0, 0.0, 1.0),
            jnp.where(bodies.locked_axes & LOCK_TY > 0, 0.0, 1.0),
        ],
        axis=-1,
    )
    rmask = jnp.where(bodies.locked_axes & LOCK_ROT > 0, 0.0, 1.0)

    force = bodies.force + bodies.const_force
    lin_acc = (
        gravity[None, :] * bodies.gravity_scale[:, None]
        + force * bodies.inv_mass[:, None]
    )
    torque = bodies.torque + bodies.const_torque
    ang_acc = torque * bodies.inv_inertia

    d1 = dynamic[:, None]
    return VelocityIncrements2D(
        lin_inc=jnp.where(d1, lin_acc * tmask * h, 0.0),
        ang_inc=jnp.where(dynamic, ang_acc * rmask * h, 0.0),
        lin_damping_rhs=1.0 / (1.0 + h * bodies.lin_damping),
        ang_damping_rhs=1.0 / (1.0 + h * bodies.ang_damping),
    )


def integrate_velocities(
    s: SolverState2D, inc: VelocityIncrements2D, bodies: Bodies2D
) -> SolverState2D:
    is_dyn = (
        (bodies.body_type == types.BodyType.DYNAMIC)
        & bodies.active
        & ~bodies.sleeping
    )
    lin_vel = jnp.where(
        is_dyn[:, None],
        s.lin_vel * inc.lin_damping_rhs[:, None] + inc.lin_inc,
        s.lin_vel,
    )
    ang_vel = jnp.where(
        is_dyn, s.ang_vel * inc.ang_damping_rhs + inc.ang_inc, s.ang_vel
    )
    return s.replace(lin_vel=lin_vel, ang_vel=ang_vel)


def clamp_velocities(s: SolverState2D, bodies: Bodies2D) -> SolverState2D:
    speed = jnp.linalg.norm(s.lin_vel, axis=-1)
    scale = jnp.minimum(
        1.0, bodies.max_lin_speed / jnp.maximum(speed, 1e-9)
    )
    lin = s.lin_vel * scale[:, None]
    ang = jnp.clip(s.ang_vel, -bodies.max_ang_speed, bodies.max_ang_speed)
    return s.replace(lin_vel=lin, ang_vel=ang)


def integrate_positions(s: SolverState2D, h: float) -> SolverState2D:
    return s.replace(
        delta_pos=s.delta_pos + s.lin_vel * h,
        delta_angle=s.delta_angle + s.ang_vel * h,
    )
