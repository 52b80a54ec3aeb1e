"""2D XPBD joint solver: fixed, distance, revolute, prismatic.

2D profile of ``pipeline/xpbd.py`` (reference ``src/dynamics/solver/xpbd/``
with ``dim2`` features): scalar angles make the angular constraints a
1-DOF Lagrange update ``Δλ = -C / (w1 + w2 + α/h²)`` with
``w = inv_inertia``; the positional constraint uses the scalar cross
``r × n = r.x n.y - r.y n.x``. Same substep placement: after contact
relaxation, with velocity projection from the delta-pose change
(``xpbd/plugin.rs:192-240``) and joint damping.
"""

from dataclasses import dataclass, fields, replace

import jax
import jax.numpy as jnp

from avian_tpu.core.config import PhysicsConfig
from avian_tpu.core.types import JointType
from avian_tpu.dim2.dynamics import SolverState2D
from avian_tpu.dim2.narrowphase import _perp, rot, rotate
from avian_tpu.dim2.state import Joints2D, World2D
from avian_tpu.pipeline.coloring import color_constraints

_PI = 3.14159265358979


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


def _cross2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


@_register
@dataclass(frozen=True)
class JointConstraints2D:
    jtype: jnp.ndarray
    body_a: jnp.ndarray
    body_b: jnp.ndarray
    mask: jnp.ndarray
    color: jnp.ndarray
    world_r1: jnp.ndarray  # f32[J, 2] anchor from COM a at prepare
    world_r2: jnp.ndarray
    center_difference: jnp.ndarray  # f32[J, 2]
    base_angle: jnp.ndarray  # f32[J] (angle_b - angle_a - reference) at prepare
    axis_world: jnp.ndarray  # f32[J, 2] prismatic axis (world, on a)
    compliance: jnp.ndarray
    limit_min: jnp.ndarray
    limit_max: jnp.ndarray
    limit_enabled: jnp.ndarray
    lin_damping: jnp.ndarray
    ang_damping: jnp.ndarray
    inv_mass_a: jnp.ndarray      # f32[J] scalar (max axis)
    inv_mass_b: jnp.ndarray
    inv_mass_vec_a: jnp.ndarray  # f32[J, 2]
    inv_mass_vec_b: jnp.ndarray
    inv_inertia_a: jnp.ndarray   # f32[J]
    inv_inertia_b: jnp.ndarray
    total_pos_lagrange: jnp.ndarray  # f32[J, 2]
    total_rot_lagrange: jnp.ndarray  # f32[J]
    color_j: jnp.ndarray

    def replace(self, **kw):
        return replace(self, **kw)


def prepare_joints(
    world: World2D, s: SolverState2D, config: PhysicsConfig
) -> JointConstraints2D:
    j = world.joints
    b = world.bodies
    ba, bb = j.body_a, j.body_b

    dyn_a = s.solve_mask[ba] > 0
    dyn_b = s.solve_mask[bb] > 0
    mask = j.active & (dyn_a | dyn_b)

    ca_, sa_ = rot(b.angle[ba])
    cb_, sb_ = rot(b.angle[bb])
    com_a = rotate(ca_, sa_, b.com[ba])
    com_b = rotate(cb_, sb_, b.com[bb])
    world_r1 = rotate(ca_, sa_, j.anchor_a - b.com[ba])
    world_r2 = rotate(cb_, sb_, j.anchor_b - b.com[bb])
    center_difference = (b.pos[bb] - b.pos[ba]) + (com_b - com_a)

    axis_local = jnp.stack(
        [jnp.cos(j.axis_angle), jnp.sin(j.axis_angle)], axis=-1
    )
    axis_world = rotate(ca_, sa_, axis_local)

    color, _ = color_constraints(
        ba, bb, dyn_a, dyn_b, mask, b.capacity, config.max_colors,
        prev_color=j.color,
    )

    return JointConstraints2D(
        jtype=j.jtype,
        body_a=ba,
        body_b=bb,
        mask=mask.astype(jnp.float32),
        color=color,
        world_r1=world_r1,
        world_r2=world_r2,
        center_difference=center_difference,
        base_angle=b.angle[bb] - b.angle[ba] - j.reference_angle,
        axis_world=axis_world,
        compliance=j.compliance,
        limit_min=j.limit_min,
        limit_max=j.limit_max,
        limit_enabled=j.limit_enabled,
        lin_damping=j.lin_damping,
        ang_damping=j.ang_damping,
        inv_mass_a=jnp.max(s.inv_mass[ba], axis=-1),
        inv_mass_b=jnp.max(s.inv_mass[bb], axis=-1),
        inv_mass_vec_a=s.inv_mass[ba],
        inv_mass_vec_b=s.inv_mass[bb],
        inv_inertia_a=s.inv_inertia[ba],
        inv_inertia_b=s.inv_inertia[bb],
        total_pos_lagrange=jnp.zeros((j.capacity, 2), jnp.float32),
        total_rot_lagrange=jnp.zeros((j.capacity,), jnp.float32),
        color_j=jnp.where(mask, color, -1),
    )


def _angular_correction(jc, c_err, compliance, h, active):
    """Cancel the scalar angle error ``c_err`` (θ_b - θ_a - target)."""
    w_sum = jc.inv_inertia_a + jc.inv_inertia_b
    tilde = compliance / (h * h)
    ok = active & (w_sum > 1e-12)
    dl = jnp.where(ok, -c_err / jnp.maximum(w_sum + tilde, 1e-12), 0.0)
    dth_a = -jc.inv_inertia_a * dl
    dth_b = jc.inv_inertia_b * dl
    return dth_a, dth_b, dl


def _positional_correction(jc, dth_a, dth_b, correction, compliance, h, active):
    c = jnp.linalg.norm(correction, axis=-1)
    ok = active & (c > 1e-9)
    dir_ = -correction / jnp.maximum(c, 1e-9)[..., None]

    ca_, sa_ = rot(dth_a)
    cb_, sb_ = rot(dth_b)
    r1 = rotate(ca_, sa_, jc.world_r1)
    r2 = rotate(cb_, sb_, jc.world_r2)

    r1xn = _cross2(r1, dir_)
    r2xn = _cross2(r2, dir_)
    w1 = jc.inv_mass_a + jc.inv_inertia_a * r1xn * r1xn
    w2 = jc.inv_mass_b + jc.inv_inertia_b * r2xn * r2xn
    w_sum = w1 + w2
    tilde = compliance / (h * h)
    dl = jnp.where(
        ok & (w_sum > 1e-12), -c / jnp.maximum(w_sum + tilde, 1e-12), 0.0
    )
    impulse = dl[..., None] * dir_

    d_pos_a = impulse * jc.inv_mass_vec_a
    d_pos_b = -impulse * jc.inv_mass_vec_b
    dth_a2 = jc.inv_inertia_a * _cross2(r1, impulse)
    dth_b2 = -jc.inv_inertia_b * _cross2(r2, impulse)
    return d_pos_a, dth_a2, d_pos_b, dth_b2, impulse


def solve_position_constraints(
    s: SolverState2D,
    jc,
    bodies,
    h: float,
    config: PhysicsConfig,
    custom=None,
    custom_data=None,
):
    pre_dp = s.delta_pos
    pre_dth = s.delta_angle

    has_builtin = jc is not None and jc.mask.shape[0] > 0
    if has_builtin:
        for c in range(config.max_colors):
            s, jc = _solve_color(s, jc, (jc.color == c) & (jc.mask > 0), h)
    if custom is not None:
        s, custom_data = custom.solve(s, custom_data, h)

    # Velocity projection from delta-pose change (xpbd/plugin.rs:192-240).
    s = s.replace(
        lin_vel=s.lin_vel + (s.delta_pos - pre_dp) / h,
        ang_vel=s.ang_vel + (s.delta_angle - pre_dth) / h,
    )
    if has_builtin:
        s = _joint_damping(s, jc, h)
    return s, jc, custom_data


def _solve_color(s, jc, active, h):
    dp_a = s.delta_pos[jc.body_a]
    dp_b = s.delta_pos[jc.body_b]
    dth_a0 = s.delta_angle[jc.body_a]
    dth_b0 = s.delta_angle[jc.body_b]

    t = jc.jtype
    is_fixed = t == JointType.FIXED
    is_distance = t == JointType.DISTANCE
    is_revolute = t == JointType.REVOLUTE
    is_prismatic = t == JointType.PRISMATIC

    acc_dp_a = jnp.zeros_like(dp_a)
    acc_dp_b = jnp.zeros_like(dp_b)
    acc_th_a = jnp.zeros_like(dth_a0)
    acc_th_b = jnp.zeros_like(dth_b0)
    total_rot = jc.total_rot_lagrange
    total_pos = jc.total_pos_lagrange

    # ---- 1. angle alignment (fixed/prismatic) + revolute limits ---------
    cur_angle = jc.base_angle + (dth_b0 + acc_th_b) - (dth_a0 + acc_th_a)
    align_active = active & (is_fixed | is_prismatic)
    da, db, dl = _angular_correction(
        jc, cur_angle, jc.compliance[:, 1], h, align_active
    )
    acc_th_a += jnp.where(align_active, da, 0.0)
    acc_th_b += jnp.where(align_active, db, 0.0)
    total_rot += jnp.where(align_active, dl, 0.0)

    # Revolute angle limit: clamp relative angle into [min, max].
    cur_angle = jc.base_angle + (dth_b0 + acc_th_b) - (dth_a0 + acc_th_a)
    wrapped = jnp.arctan2(jnp.sin(cur_angle), jnp.cos(cur_angle))
    viol = jc.limit_enabled & (
        (wrapped < jc.limit_min) | (wrapped > jc.limit_max)
    )
    target = jnp.clip(wrapped, jc.limit_min, jc.limit_max)
    lim_active = active & is_revolute & viol
    da, db, dl = _angular_correction(
        jc, wrapped - target, jc.compliance[:, 2], h, lim_active
    )
    acc_th_a += jnp.where(lim_active, da, 0.0)
    acc_th_b += jnp.where(lim_active, db, 0.0)
    total_rot += jnp.where(lim_active, dl, 0.0)

    # ---- 2. positional constraint ---------------------------------------
    ca_, sa_ = rot(dth_a0 + acc_th_a)
    cb_, sb_ = rot(dth_b0 + acc_th_b)
    r1 = rotate(ca_, sa_, jc.world_r1)
    r2 = rotate(cb_, sb_, jc.world_r2)
    sep = (
        (dp_b + acc_dp_b) - (dp_a + acc_dp_a) + (r2 - r1)
        + jc.center_difference
    )

    point_corr = sep

    dist = jnp.linalg.norm(sep, axis=-1)
    dir_ = sep / jnp.maximum(dist, 1e-9)[..., None]
    below = dist < jc.limit_min
    above = dist > jc.limit_max
    dist_corr = jnp.where(
        below[..., None],
        -dir_ * (jc.limit_min - dist)[..., None],
        jnp.where(
            above[..., None], dir_ * (dist - jc.limit_max)[..., None], 0.0
        ),
    )

    # Prismatic: cancel separation perpendicular to the axis + axis limits.
    axis = rotate(ca_, sa_, jc.axis_world)
    along = jnp.sum(sep * axis, axis=-1)
    perp_sep = sep - axis * along[..., None]
    along_corr = jnp.where(
        jc.limit_enabled & (along < jc.limit_min),
        along - jc.limit_min,
        jnp.where(
            jc.limit_enabled & (along > jc.limit_max),
            along - jc.limit_max,
            0.0,
        ),
    )
    pris_corr = perp_sep + axis * along_corr[..., None]

    pos_corr = jnp.where(
        is_distance[..., None],
        dist_corr,
        jnp.where(is_prismatic[..., None], pris_corr, point_corr),
    )
    d_pa, th_a, d_pb, th_b, imp = _positional_correction(
        jc, dth_a0 + acc_th_a, dth_b0 + acc_th_b, pos_corr,
        jc.compliance[:, 0], h, active,
    )
    m1 = active[..., None]
    acc_dp_a += jnp.where(m1, d_pa, 0.0)
    acc_dp_b += jnp.where(m1, d_pb, 0.0)
    acc_th_a += jnp.where(active, th_a, 0.0)
    acc_th_b += jnp.where(active, th_b, 0.0)
    total_pos += jnp.where(m1, imp, 0.0)

    # ---- scatter back ----------------------------------------------------
    m = active[..., None]
    delta_pos = (
        s.delta_pos
        .at[jc.body_a].add(jnp.where(m, acc_dp_a, 0.0))
        .at[jc.body_b].add(jnp.where(m, acc_dp_b, 0.0))
    )
    delta_angle = (
        s.delta_angle
        .at[jc.body_a].add(jnp.where(active, acc_th_a, 0.0))
        .at[jc.body_b].add(jnp.where(active, acc_th_b, 0.0))
    )
    s = s.replace(delta_pos=delta_pos, delta_angle=delta_angle)
    jc = jc.replace(total_pos_lagrange=total_pos, total_rot_lagrange=total_rot)
    return s, jc


def _joint_damping(s, jc, h):
    active = jc.mask > 0
    va = s.lin_vel[jc.body_a]
    vb = s.lin_vel[jc.body_b]
    wa = s.ang_vel[jc.body_a]
    wb = s.ang_vel[jc.body_b]

    delta_omega = (wb - wa) * jnp.minimum(jc.ang_damping * h, 1.0)
    delta_v = (vb - va) * jnp.minimum(jc.lin_damping * h, 1.0)[..., None]

    w1 = jc.inv_mass_a
    w2 = jc.inv_mass_b
    wsum = w1 + w2
    p = delta_v * jnp.where(wsum > 1e-12, 1.0 / jnp.maximum(wsum, 1e-12), 0.0)[..., None]

    m = active[..., None]
    resp_a = jc.inv_inertia_a > 0
    resp_b = jc.inv_inertia_b > 0
    lin = (
        s.lin_vel
        .at[jc.body_a].add(jnp.where(m, p * w1[..., None], 0.0))
        .at[jc.body_b].add(jnp.where(m, -p * w2[..., None], 0.0))
    )
    ang = (
        s.ang_vel
        .at[jc.body_a].add(jnp.where(active & resp_a, delta_omega, 0.0))
        .at[jc.body_b].add(jnp.where(active & resp_b, -delta_omega, 0.0))
    )
    return s.replace(lin_vel=lin, ang_vel=ang)


def store_joint_forces(
    joints: Joints2D, jc: JointConstraints2D, config: PhysicsConfig
) -> Joints2D:
    h = config.substep_dt
    rhs = config.substeps / (h * h)
    total = jnp.concatenate(
        [
            jc.total_pos_lagrange * rhs,
            jc.total_rot_lagrange[:, None] * rhs,
        ],
        axis=-1,
    )
    return joints.replace(total_lambda=total, color=jc.color_j)
