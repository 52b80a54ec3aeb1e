"""Transient solver-body state: the hot per-step mirror of body state.

Counterpart of the reference's ``SolverBody`` + ``SolverBodyInertia``
(``src/dynamics/solver/solver_body/mod.rs:59,176-206``): velocities plus
*delta* position/rotation (to avoid far-from-origin error), and effective
(locked-axis-masked) inverse mass/inertia. Static and sleeping bodies get a
zero-velocity, zero-delta, zero-inverse-mass state instead of being skipped —
masking replaces branching on TPU.
"""

from dataclasses import dataclass, fields, replace

import jax
import jax.numpy as jnp

from avian_tpu.core import types
from avian_tpu.core.state import Bodies
from avian_tpu.math import quat as quat_m
from avian_tpu.math import sym3


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass(frozen=True)
class SolverState:
    """Per-body solver state for one physics step (all f32, SoA)."""

    lin_vel: jnp.ndarray     # [N, 3]
    ang_vel: jnp.ndarray     # [N, 3]
    delta_pos: jnp.ndarray   # [N, 3]
    delta_quat: jnp.ndarray  # [N, 4]
    inv_mass: jnp.ndarray    # [N, 3] effective per-axis inverse mass
    inv_inertia: jnp.ndarray  # [N, 6] effective world-space inverse inertia
    solve_mask: jnp.ndarray  # f32[N] 1.0 if the body responds to impulses

    def replace(self, **kw):
        return replace(self, **kw)


def locked_translation_mask(locked_axes):
    """f32[N, 3]: 0 where the translation axis is locked, else 1."""
    bits = jnp.stack(
        [
            locked_axes & types.LOCK_TX,
            locked_axes & types.LOCK_TY,
            locked_axes & types.LOCK_TZ,
        ],
        axis=-1,
    )
    return jnp.where(bits > 0, 0.0, 1.0)


def locked_rotation_mask(locked_axes):
    """f32[N, 3]: 0 where the rotation axis is locked, else 1."""
    bits = jnp.stack(
        [
            locked_axes & types.LOCK_RX,
            locked_axes & types.LOCK_RY,
            locked_axes & types.LOCK_RZ,
        ],
        axis=-1,
    )
    return jnp.where(bits > 0, 0.0, 1.0)


def mask_inertia(inertia6, rmask):
    """Zero rows+columns of a symmetric tensor for locked rotation axes."""
    x, y, z = rmask[..., 0], rmask[..., 1], rmask[..., 2]
    m = jnp.stack([x * x, y * y, z * z, x * y, x * z, y * z], axis=-1)
    return inertia6 * m


def world_inv_inertia(bodies: Bodies):
    """World-frame inverse inertia ``R I^-1 R^T`` as sym6."""
    rot = quat_m.to_mat3(bodies.quat)
    return sym3.rotate(bodies.inv_inertia, rot)


def prepare(bodies: Bodies) -> SolverState:
    """Build the solver state (reference ``prepare_solver_bodies``,
    ``solver_body/plugin.rs:173-251``)."""
    n = bodies.capacity
    dynamic = bodies.body_type == types.BodyType.DYNAMIC
    moving = bodies.active & ~bodies.sleeping & (
        bodies.body_type != types.BodyType.STATIC
    )
    responds = dynamic & moving

    tmask = locked_translation_mask(bodies.locked_axes)
    rmask = locked_rotation_mask(bodies.locked_axes)

    inv_mass = jnp.where(responds[:, None], bodies.inv_mass[:, None] * tmask, 0.0)
    inv_inertia = jnp.where(
        responds[:, None],
        mask_inertia(world_inv_inertia(bodies), rmask),
        0.0,
    )

    vel_mask = moving[:, None]
    return SolverState(
        lin_vel=jnp.where(vel_mask, bodies.lin_vel, 0.0),
        ang_vel=jnp.where(vel_mask, bodies.ang_vel, 0.0),
        delta_pos=jnp.zeros((n, 3), jnp.float32),
        delta_quat=quat_m.identity((n,)),
        inv_mass=inv_mass,
        inv_inertia=inv_inertia,
        solve_mask=responds.astype(jnp.float32),
    )


def writeback(bodies: Bodies, s: SolverState) -> Bodies:
    """Apply delta pose rotating about the center of mass (reference
    ``writeback_solver_bodies``, ``solver_body/plugin.rs:255-284``)."""
    old_world_com = quat_m.rotate(bodies.quat, bodies.com)
    new_quat = quat_m.fast_renormalize(quat_m.mul(s.delta_quat, bodies.quat))
    new_world_com = quat_m.rotate(new_quat, bodies.com)
    new_pos = bodies.pos + s.delta_pos + old_world_com - new_world_com

    moving = bodies.active & ~bodies.sleeping & (
        bodies.body_type != types.BodyType.STATIC
    )
    m1 = moving[:, None]
    return bodies.replace(
        pos=jnp.where(m1, new_pos, bodies.pos),
        quat=jnp.where(m1, new_quat, bodies.quat),
        lin_vel=jnp.where(m1, s.lin_vel, bodies.lin_vel),
        ang_vel=jnp.where(m1, s.ang_vel, bodies.ang_vel),
    )
