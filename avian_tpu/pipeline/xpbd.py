"""XPBD joint solver: fixed, distance, revolute, prismatic, spherical.

Position-level joint solving in the substep loop after contact relaxation
(reference ``src/dynamics/solver/xpbd/``): each joint decomposes into a
shared point-to-point constraint (``joints/shared/point_constraint.rs``) and
angular align/limit constraints (``angular_constraint.rs:112-149``), with the
Lagrange update ``Δλ = -C / (Σw + α/h²)`` (``xpbd/mod.rs:361-413``; the
per-call λ is zero in the reference too, only totals accumulate). Velocities
are recovered afterwards from the delta-pose change
(``xpbd/plugin.rs:192-240``), followed by joint damping
(``plugin.rs:759-806``).

Joint frames: the joint's primary axis (hinge / slider / swing) is the local
Z of each body's ``frame_quat``; X is the secondary axis used for angle
limits. All joint types are evaluated for every slot and selected by type
(small-branch select beats real dispatch on the VPU); joints are colored like
contacts so same-color joints update disjoint bodies.
"""

from dataclasses import dataclass, fields, replace

import jax
import jax.numpy as jnp
import numpy as _np

from avian_tpu.core.config import PhysicsConfig
from avian_tpu.core.state import Joints, World
from avian_tpu.core.types import JointType
from avian_tpu.math import quat as quat_m
from avian_tpu.math import sym3, vec
from avian_tpu.pipeline.coloring import color_constraints
from avian_tpu.pipeline.solver_body import SolverState

_PI = 3.14159265358979
# numpy, not jnp: device-array constants captured into jit poison the
# runtime dispatch path (see geometry/narrowphase.py note).
_Z = _np.asarray([0.0, 0.0, 1.0], _np.float32)
_X = _np.asarray([1.0, 0.0, 0.0], _np.float32)


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass(frozen=True)
class JointConstraints:
    """Transient per-step joint solver data (SoA over joint slots)."""

    jtype: jnp.ndarray        # i32[J]
    body_a: jnp.ndarray       # i32[J]
    body_b: jnp.ndarray       # i32[J]
    mask: jnp.ndarray         # f32[J]
    color: jnp.ndarray        # i32[J]
    world_r1: jnp.ndarray     # f32[J, 3] anchor from COM a (world, at prepare)
    world_r2: jnp.ndarray     # f32[J, 3]
    center_difference: jnp.ndarray  # f32[J, 3]
    axis_a: jnp.ndarray       # f32[J, 3] world primary axis on a (basis Z)
    axis_b: jnp.ndarray       # f32[J, 3]
    sec_a: jnp.ndarray        # f32[J, 3] world secondary axis on a (basis X)
    sec_b: jnp.ndarray        # f32[J, 3]
    rot_difference: jnp.ndarray  # f32[J, 4] (qa*basis_a)(qb*basis_b)^-1
    compliance: jnp.ndarray   # f32[J, 4] (point, align, limit, _)
    limit_min: jnp.ndarray    # f32[J]
    limit_max: jnp.ndarray    # f32[J]
    limit_enabled: jnp.ndarray  # bool[J]
    twist_min: jnp.ndarray    # f32[J]
    twist_max: jnp.ndarray    # f32[J]
    twist_enabled: jnp.ndarray  # bool[J]
    lin_damping: jnp.ndarray  # f32[J]
    ang_damping: jnp.ndarray  # f32[J]
    inv_mass_a: jnp.ndarray   # f32[J] (max element of per-axis inv mass)
    inv_mass_b: jnp.ndarray   # f32[J]
    inv_mass_vec_a: jnp.ndarray  # f32[J, 3]
    inv_mass_vec_b: jnp.ndarray  # f32[J, 3]
    inv_inertia_a: jnp.ndarray  # f32[J, 6]
    inv_inertia_b: jnp.ndarray  # f32[J, 6]
    total_pos_lagrange: jnp.ndarray  # f32[J, 3]
    total_rot_lagrange: jnp.ndarray  # f32[J, 3]
    color_j: jnp.ndarray  # i32[J] persisted back to Joints

    def replace(self, **kw):
        return replace(self, **kw)


def prepare_joints(world: World, s: SolverState, config: PhysicsConfig) -> JointConstraints:
    """``prepare_xpbd_joint`` (``xpbd/plugin.rs:43-55``) + per-joint
    ``XpbdConstraint::prepare``."""
    j = world.joints
    b = world.bodies
    ba, bb = j.body_a, j.body_b

    dyn_a = s.solve_mask[ba] > 0
    dyn_b = s.solve_mask[bb] > 0
    mask = j.active & (dyn_a | dyn_b)

    qa, qb = b.quat[ba], b.quat[bb]
    com_a = quat_m.rotate(qa, b.com[ba])
    com_b = quat_m.rotate(qb, b.com[bb])
    # world_r = rotation * (local_anchor - com) (point_constraint.rs:44-49)
    world_r1 = quat_m.rotate(qa, j.frame_pos_a - b.com[ba])
    world_r2 = quat_m.rotate(qb, j.frame_pos_b - b.com[bb])
    center_difference = (b.pos[bb] - b.pos[ba]) + (com_b - com_a)

    basis_a_w = quat_m.mul(qa, j.frame_quat_a)
    basis_b_w = quat_m.mul(qb, j.frame_quat_b)

    color, _ = color_constraints(
        ba, bb, dyn_a, dyn_b, mask, b.capacity, config.max_colors,
        prev_color=j.color,
    )

    return JointConstraints(
        jtype=j.jtype,
        body_a=ba,
        body_b=bb,
        mask=mask.astype(jnp.float32),
        color=color,
        world_r1=world_r1,
        world_r2=world_r2,
        center_difference=center_difference,
        axis_a=quat_m.rotate(basis_a_w, _Z),
        axis_b=quat_m.rotate(basis_b_w, _Z),
        sec_a=quat_m.rotate(basis_a_w, _X),
        sec_b=quat_m.rotate(basis_b_w, _X),
        rot_difference=quat_m.mul(basis_a_w, quat_m.conj(basis_b_w)),
        compliance=j.compliance,
        limit_min=j.limit_min,
        limit_max=j.limit_max,
        limit_enabled=j.limit_enabled,
        twist_min=j.twist_min,
        twist_max=j.twist_max,
        twist_enabled=j.twist_enabled,
        lin_damping=j.lin_damping,
        ang_damping=j.ang_damping,
        inv_mass_a=jnp.max(s.inv_mass[ba], axis=-1),
        inv_mass_b=jnp.max(s.inv_mass[bb], axis=-1),
        inv_mass_vec_a=s.inv_mass[ba],
        inv_mass_vec_b=s.inv_mass[bb],
        inv_inertia_a=s.inv_inertia[ba],
        inv_inertia_b=s.inv_inertia[bb],
        total_pos_lagrange=jnp.zeros((j.capacity, 3), jnp.float32),
        total_rot_lagrange=jnp.zeros((j.capacity, 3), jnp.float32),
        color_j=jnp.where(mask, color, -1),
    )


# --------------------------------------------------------------------------
# Correction primitives (vectorized over joints). Each returns delta-pose
# increments; composition happens once per color in the caller.
# --------------------------------------------------------------------------


def _angular_correction(jc, st, difference, compliance, h, active):
    """``align_orientation`` 3D (``angular_constraint.rs:145+``): rotate both
    bodies to cancel the rotation-vector ``difference``. Returns
    (rotvec_a, rotvec_b, lagrange_impulse)."""
    angle = vec.length(difference)
    ok = active & (angle > 1e-9)
    axis = difference / jnp.maximum(angle, 1e-9)[..., None]

    w1 = vec.dot(axis, sym3.mv(jc.inv_inertia_a, axis))
    w2 = vec.dot(axis, sym3.mv(jc.inv_inertia_b, axis))
    w_sum = w1 + w2
    tilde = compliance / (h * h)
    delta_lagrange = jnp.where(
        ok & (w_sum > 1e-12), -angle / jnp.maximum(w_sum + tilde, 1e-12), 0.0
    )
    impulse = -delta_lagrange[..., None] * axis
    rv_a = sym3.mv(jc.inv_inertia_a, impulse)
    rv_b = -sym3.mv(jc.inv_inertia_b, impulse)
    return rv_a, rv_b, impulse


def _positional_correction(jc, dp_a, dp_b, dq_a, dq_b, correction, compliance, h, active):
    """Positional correction of vector ``correction`` (= dir * C) applied at
    the joint anchors (``positional_constraint.rs`` +
    ``point_constraint.rs:53-110``). Returns (d_pos_a, rotvec_a, d_pos_b,
    rotvec_b, lagrange_impulse)."""
    c = vec.length(correction)
    ok = active & (c > 1e-9)
    dir_ = -correction / jnp.maximum(c, 1e-9)[..., None]

    r1 = quat_m.rotate(dq_a, jc.world_r1)
    r2 = quat_m.rotate(dq_b, jc.world_r2)

    r1xn = jnp.cross(r1, dir_)
    r2xn = jnp.cross(r2, dir_)
    w1 = jc.inv_mass_a + vec.dot(r1xn, sym3.mv(jc.inv_inertia_a, r1xn))
    w2 = jc.inv_mass_b + vec.dot(r2xn, sym3.mv(jc.inv_inertia_b, r2xn))
    w_sum = w1 + w2
    tilde = compliance / (h * h)
    delta_lagrange = jnp.where(
        ok & (w_sum > 1e-12), -c / jnp.maximum(w_sum + tilde, 1e-12), 0.0
    )
    impulse = delta_lagrange[..., None] * dir_

    d_pos_a = impulse * jc.inv_mass_vec_a
    d_pos_b = -impulse * jc.inv_mass_vec_b
    rv_a = sym3.mv(jc.inv_inertia_a, jnp.cross(r1, impulse))
    rv_b = -sym3.mv(jc.inv_inertia_b, jnp.cross(r2, impulse))
    return d_pos_a, rv_a, d_pos_b, rv_b, impulse


def _separation(jc, dp_a, dp_b, dq_a, dq_b):
    r1 = quat_m.rotate(dq_a, jc.world_r1)
    r2 = quat_m.rotate(dq_b, jc.world_r2)
    return (dp_b - dp_a) + (r2 - r1) + jc.center_difference


def _angle_limit_correction(limit_axis, axis1, axis2, lim_min, lim_max, enabled):
    """3D ``AngleLimit::compute_correction`` (``joints/mod.rs:427-473``)."""
    sphi = jnp.clip(vec.dot(jnp.cross(axis1, axis2), limit_axis), -1.0, 1.0)
    phi = jnp.arcsin(sphi)
    obtuse = vec.dot(axis1, axis2) < 0.0
    phi = jnp.where(obtuse, _PI - phi, phi)
    phi = jnp.where(phi > _PI, phi - 2.0 * _PI, phi)
    violated = enabled & ((phi < lim_min) | (phi > lim_max))
    phi_t = jnp.clip(phi, lim_min, lim_max)
    rot = quat_m.from_axis_angle(limit_axis, phi_t)
    corr = jnp.cross(quat_m.rotate(rot, axis1), axis2)
    corr = vec.clamp_length_max(corr, _PI)
    return jnp.where(violated[..., None], corr, 0.0), violated


def solve_position_constraints(
    s: SolverState,
    jc,
    bodies,
    h: float,
    config: PhysicsConfig,
    custom=None,
    custom_data=None,
):
    """One substep of position-level constraint solving: built-in joints,
    then USER constraints, then one shared velocity projection + damping.

    ``custom`` is the TPU-native counterpart of the reference's
    ``XpbdConstraint`` trait + ``XpbdSolverSystems::SolveUserConstraints``
    slot (``xpbd/mod.rs:23-52``, ``custom_constraint.rs``): a static object
    whose ``solve(s, data, h) -> (s, data)`` runs INSIDE the same
    position-solve window as the built-in joints, so its delta-pose edits
    are picked up by the shared velocity projection
    (``xpbd/plugin.rs:192-240``) exactly like the reference's.
    """
    pre_delta_pos = s.delta_pos
    pre_delta_quat = s.delta_quat

    has_builtin = jc is not None and jc.mask.shape[0] > 0
    if has_builtin:
        for c in range(config.max_colors):
            s, jc = _solve_color(s, jc, (jc.color == c) & (jc.mask > 0), h)
    if custom is not None:
        s, custom_data = custom.solve(s, custom_data, h)

    # Velocity projection from delta-pose change (xpbd/plugin.rs:192-240).
    new_lin = (s.delta_pos - pre_delta_pos) / h
    dq = quat_m.mul(s.delta_quat, quat_m.conj(pre_delta_quat))
    new_ang = 2.0 * dq[..., :3] / h
    new_ang = jnp.where(dq[..., 3:4] < 0.0, -new_ang, new_ang)
    s = s.replace(lin_vel=s.lin_vel + new_lin, ang_vel=s.ang_vel + new_ang)

    # Joint damping (plugin.rs:759-806).
    if has_builtin:
        s = _joint_damping(s, jc, h)
    return s, jc, custom_data


def solve_joints(
    s: SolverState, jc: JointConstraints, bodies, h: float, config: PhysicsConfig
):
    """One substep of joint solving + velocity projection + joint damping
    (substep items 6-7 in SURVEY.md §3.1)."""
    if jc.mask.shape[0] == 0:
        return s, jc
    s, jc, _ = solve_position_constraints(s, jc, bodies, h, config)
    return s, jc


def _solve_color(s, jc, active, h):
    dp_a = s.delta_pos[jc.body_a]
    dp_b = s.delta_pos[jc.body_b]
    dq_a = s.delta_quat[jc.body_a]
    dq_b = s.delta_quat[jc.body_b]

    t = jc.jtype
    is_fixed = t == JointType.FIXED
    is_distance = t == JointType.DISTANCE
    is_revolute = t == JointType.REVOLUTE
    is_prismatic = t == JointType.PRISMATIC
    is_spherical = t == JointType.SPHERICAL

    acc_dp_a = jnp.zeros_like(dp_a)
    acc_dp_b = jnp.zeros_like(dp_b)
    acc_rv_a = jnp.zeros_like(dp_a)
    acc_rv_b = jnp.zeros_like(dp_b)
    total_rot = jc.total_rot_lagrange
    total_pos = jc.total_pos_lagrange

    def cur_dq_a():
        return quat_m.mul(quat_m.from_scaled_axis(acc_rv_a), dq_a)

    def cur_dq_b():
        return quat_m.mul(quat_m.from_scaled_axis(acc_rv_b), dq_b)

    # ---- 1. angular alignment --------------------------------------------
    # Fixed/prismatic: full orientation lock;
    # revolute: hinge-axis alignment a1 x a2.
    qd_a, qd_b = cur_dq_a(), cur_dq_b()
    full_diff = -2.0 * quat_m.mul(
        quat_m.mul(jc.rot_difference, qd_a), quat_m.conj(qd_b)
    )[..., :3]
    a1 = quat_m.rotate(qd_a, jc.axis_a)
    a2 = quat_m.rotate(qd_b, jc.axis_b)
    hinge_diff = jnp.cross(a1, a2)
    diff = jnp.where(
        (is_fixed | is_prismatic)[..., None],
        full_diff,
        jnp.where(is_revolute[..., None], hinge_diff, 0.0),
    )
    align_active = active & (is_fixed | is_prismatic | is_revolute)
    rv_a, rv_b, imp = _angular_correction(
        jc, s, diff, jc.compliance[:, 1], h, align_active
    )
    acc_rv_a += jnp.where(align_active[..., None], rv_a, 0.0)
    acc_rv_b += jnp.where(align_active[..., None], rv_b, 0.0)
    total_rot += jnp.where(align_active[..., None], imp, 0.0)

    # ---- 2. angle limits (revolute about hinge; spherical swing) ----------
    qd_a, qd_b = cur_dq_a(), cur_dq_b()
    a1 = quat_m.rotate(qd_a, jc.axis_a)
    a2 = quat_m.rotate(qd_b, jc.axis_b)
    b1 = quat_m.rotate(qd_a, jc.sec_a)
    b2 = quat_m.rotate(qd_b, jc.sec_b)
    # Revolute: limit rotation of secondary axes about the hinge axis a1.
    corr_rev, viol_rev = _angle_limit_correction(
        a1, b1, b2, jc.limit_min, jc.limit_max, jc.limit_enabled
    )
    # Spherical swing: limit angle between the primary axes about their
    # common normal (spherical.rs:112-150).
    n_sw = jnp.cross(a1, a2)
    n_sw = vec.normalize_or(n_sw, _X)
    corr_sph, viol_sph = _angle_limit_correction(
        n_sw, a1, a2, jc.limit_min, jc.limit_max, jc.limit_enabled
    )
    lim_corr = jnp.where(
        is_revolute[..., None],
        corr_rev,
        jnp.where(is_spherical[..., None], corr_sph, 0.0),
    )
    lim_active = active & (
        (is_revolute & viol_rev) | (is_spherical & viol_sph)
    )
    rv_a, rv_b, imp = _angular_correction(
        jc, s, lim_corr, jc.compliance[:, 2], h, lim_active
    )
    acc_rv_a += jnp.where(lim_active[..., None], rv_a, 0.0)
    acc_rv_b += jnp.where(lim_active[..., None], rv_b, 0.0)
    total_rot += jnp.where(lim_active[..., None], imp, 0.0)

    # ---- 2b. spherical twist limit (spherical.rs:76-80, apply_twist) ------
    # Rotation about the shared primary axis n = normalize(a1 + a2): project
    # both secondary axes into the plane perpendicular to n and limit their
    # angle about n (XPBD joint-limit formulation).
    qd_a, qd_b = cur_dq_a(), cur_dq_b()
    a1 = quat_m.rotate(qd_a, jc.axis_a)
    a2 = quat_m.rotate(qd_b, jc.axis_b)
    b1 = quat_m.rotate(qd_a, jc.sec_a)
    b2 = quat_m.rotate(qd_b, jc.sec_b)
    n_tw = vec.normalize_or(a1 + a2, _X)
    n1 = vec.normalize_or(b1 - n_tw * vec.dot(n_tw, b1)[..., None], _X)
    n2 = vec.normalize_or(b2 - n_tw * vec.dot(n_tw, b2)[..., None], _X)
    corr_tw, viol_tw = _angle_limit_correction(
        n_tw, n1, n2, jc.twist_min, jc.twist_max, jc.twist_enabled
    )
    tw_active = active & is_spherical & viol_tw
    rv_a, rv_b, imp = _angular_correction(
        jc, s, jnp.where(tw_active[..., None], corr_tw, 0.0),
        jc.compliance[:, 3], h, tw_active
    )
    acc_rv_a += jnp.where(tw_active[..., None], rv_a, 0.0)
    acc_rv_b += jnp.where(tw_active[..., None], rv_b, 0.0)
    total_rot += jnp.where(tw_active[..., None], imp, 0.0)

    # ---- 3. positional constraint ------------------------------------------
    qd_a, qd_b = cur_dq_a(), cur_dq_b()
    sep = _separation(jc, dp_a + acc_dp_a, dp_b + acc_dp_b, qd_a, qd_b)

    # Point-to-point (fixed/revolute/spherical): correction = full separation.
    point_corr = sep

    # Distance: correction toward the [min, max] distance band
    # (DistanceLimit::compute_correction, joints/mod.rs:321-340).
    dist = vec.length(sep)
    dir_ = sep / jnp.maximum(dist, 1e-9)[..., None]
    below = dist < jc.limit_min
    above = dist > jc.limit_max
    dist_corr = jnp.where(
        below[..., None],
        -dir_ * (jc.limit_min - dist)[..., None],
        jnp.where(above[..., None], dir_ * (dist - jc.limit_max)[..., None], 0.0),
    )

    # Prismatic: cancel separation perpendicular to the free axis, plus
    # limits along it (prismatic.rs:102-156).
    axis1 = quat_m.rotate(qd_a, jc.axis_a)
    along = vec.dot(sep, axis1)
    perp = sep - axis1 * along[..., None]
    along_corr = jnp.where(
        jc.limit_enabled & (along < jc.limit_min),
        along - jc.limit_min,
        jnp.where(
            jc.limit_enabled & (along > jc.limit_max), along - jc.limit_max, 0.0
        ),
    )
    pris_corr = perp + axis1 * along_corr[..., None]

    pos_corr = jnp.where(
        is_distance[..., None],
        dist_corr,
        jnp.where(is_prismatic[..., None], pris_corr, point_corr),
    )
    pos_active = active
    d_pa, rv_a, d_pb, rv_b, imp = _positional_correction(
        jc.replace(
            world_r1=quat_m.rotate(quat_m.from_scaled_axis(acc_rv_a), jc.world_r1),
            world_r2=quat_m.rotate(quat_m.from_scaled_axis(acc_rv_b), jc.world_r2),
        ),
        dp_a, dp_b, qd_a, qd_b,
        pos_corr,
        jnp.where(is_distance | is_prismatic, jc.compliance[:, 0], jc.compliance[:, 0]),
        h,
        pos_active,
    )
    m1 = pos_active[..., None]
    acc_dp_a += jnp.where(m1, d_pa, 0.0)
    acc_dp_b += jnp.where(m1, d_pb, 0.0)
    acc_rv_a += jnp.where(m1, rv_a, 0.0)
    acc_rv_b += jnp.where(m1, rv_b, 0.0)
    total_pos += jnp.where(m1, imp, 0.0)

    # ---- scatter back -----------------------------------------------------
    m = active[..., None]
    delta_pos = (
        s.delta_pos
        .at[jc.body_a].add(jnp.where(m, acc_dp_a, 0.0))
        .at[jc.body_b].add(jnp.where(m, acc_dp_b, 0.0))
    )
    rot_acc = (
        jnp.zeros_like(s.delta_pos)
        .at[jc.body_a].add(jnp.where(m, acc_rv_a, 0.0))
        .at[jc.body_b].add(jnp.where(m, acc_rv_b, 0.0))
    )
    delta_quat = quat_m.mul(quat_m.from_scaled_axis(rot_acc), s.delta_quat)

    s = s.replace(delta_pos=delta_pos, delta_quat=delta_quat)
    jc = jc.replace(total_pos_lagrange=total_pos, total_rot_lagrange=total_rot)
    return s, jc


def _joint_damping(s, jc, h):
    active = jc.mask > 0
    va = s.lin_vel[jc.body_a]
    vb = s.lin_vel[jc.body_b]
    wa = s.ang_vel[jc.body_a]
    wb = s.ang_vel[jc.body_b]

    delta_omega = (wb - wa) * jnp.minimum(jc.ang_damping * h, 1.0)[..., None]
    delta_v = (vb - va) * jnp.minimum(jc.lin_damping * h, 1.0)[..., None]

    w1 = jc.inv_mass_a
    w2 = jc.inv_mass_b
    p = delta_v * vec.safe_recip(w1 + w2)[..., None]

    m = active[..., None]
    # Angular damping applies to non-kinematic solver bodies; bodies with
    # zero inverse inertia are static-like, matching the reference's guard.
    resp_a = (jnp.sum(jnp.abs(jc.inv_inertia_a), axis=-1) > 0)[..., None]
    resp_b = (jnp.sum(jnp.abs(jc.inv_inertia_b), axis=-1) > 0)[..., None]
    lin = (
        s.lin_vel
        .at[jc.body_a].add(jnp.where(m, p * w1[..., None], 0.0))
        .at[jc.body_b].add(jnp.where(m, -p * w2[..., None], 0.0))
    )
    ang = (
        s.ang_vel
        .at[jc.body_a].add(jnp.where(m & resp_a, delta_omega, 0.0))
        .at[jc.body_b].add(jnp.where(m & resp_b, -delta_omega, 0.0))
    )
    return s.replace(lin_vel=lin, ang_vel=ang)


def store_joint_forces(joints: Joints, jc: JointConstraints, config: PhysicsConfig) -> Joints:
    """JointForces readback: ``f = λ_total * substeps / h²``
    (``writeback_joint_forces``, ``xpbd/plugin.rs:242-260``)."""
    h = config.substep_dt
    rhs = config.substeps / (h * h)
    total = jnp.concatenate(
        [jc.total_pos_lagrange * rhs, jc.total_rot_lagrange * rhs], axis=-1
    )
    return joints.replace(total_lambda=total, color=jc.color_j)
