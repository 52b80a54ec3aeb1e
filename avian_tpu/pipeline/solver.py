"""TGS-soft contact constraint solver with warm starting and graph coloring.

Faithful TPU-native re-derivation of the reference's substepped impulse
solver (``src/dynamics/solver/``): soft-constraint normal impulses with
bias/mass/impulse coefficients (``softness_parameters/mod.rs:64-79``),
speculative-contact branch, simultaneous two-axis Coulomb friction
(``contact/tangent_part.rs``), a bias + relax two-pass scheme per substep
(``plugin.rs:27-36``), and a post-substep restitution pass
(``contact/mod.rs:358-407``).

Parallelization: constraints are colored (``pipeline.coloring``); colors are
solved sequentially, and all constraints within a color gather body state,
solve all their points, and scatter velocity deltas at once — writes within a
color are disjoint by construction. The overflow color uses accumulated
scatter-adds (Jacobi-style), mirroring the reference's serially-solved
overflow color in effect if not in mechanism.
"""

import math
from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp

from avian_tpu.core import types
from avian_tpu.core.config import PhysicsConfig
from avian_tpu.core.state import Contacts, World, MAX_POINTS
from avian_tpu.math import sym3, vec
from avian_tpu.pipeline.coloring import color_constraints
from avian_tpu.pipeline.solver_body import SolverState


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


def softness_coefficients(damping_ratio, hz, h):
    """(bias, mass_scale, impulse_scale) — ``compute_coefficients``
    (``softness_parameters/mod.rs:64-79``). Host-side floats (static)."""
    omega = 2.0 * math.pi * hz
    a1 = 2.0 * damping_ratio + omega * h
    a2 = omega * h * a1
    a3 = 1.0 / (1.0 + a2)
    return omega / a1, a2 * a3, a3


def contact_softness(config: PhysicsConfig):
    """Dynamic and non-dynamic contact softness for the current timestep
    (``update_contact_softness``, ``plugin.rs:326-350``)."""
    dt = config.dt
    h = config.substep_dt
    max_hz = 1.0 / (2.0 * dt)
    hz = config.solver.contact_frequency_factor * min(max_hz, 0.25 / h)
    dyn = softness_coefficients(config.solver.contact_damping_ratio, hz, h)
    non_dyn = softness_coefficients(
        config.solver.contact_damping_ratio, 2.0 * hz, h
    )
    return dyn, non_dyn


@_register
@dataclass(frozen=True)
class ContactConstraints:
    """Transient per-step contact constraint data (SoA over pair slots)."""

    body_a: jnp.ndarray       # i32[C]
    body_b: jnp.ndarray       # i32[C]
    mask: jnp.ndarray         # f32[C] 1.0 = solve this pair
    color: jnp.ndarray        # i32[C]
    normal: jnp.ndarray       # f32[C, 3]
    tangent1: jnp.ndarray     # f32[C, 3]
    tangent2: jnp.ndarray     # f32[C, 3]
    friction: jnp.ndarray     # f32[C]
    restitution: jnp.ndarray  # f32[C]
    softness: jnp.ndarray     # f32[C, 3] (bias, mass_scale, impulse_scale)
    inv_mass_a: jnp.ndarray   # f32[C, 3] per-axis, after dominance
    inv_mass_b: jnp.ndarray   # f32[C, 3]
    inv_inertia_a: jnp.ndarray  # f32[C, 6]
    inv_inertia_b: jnp.ndarray  # f32[C, 6]
    # Per point
    point_mask: jnp.ndarray   # f32[C, P]
    anchor_a: jnp.ndarray     # f32[C, P, 3] world, from COM, fixed
    anchor_b: jnp.ndarray     # f32[C, P, 3]
    initial_separation: jnp.ndarray  # f32[C, P]
    normal_mass: jnp.ndarray  # f32[C, P]
    tangent_k: jnp.ndarray    # f32[C, P, 3] (k1, k2, k12) inverse masses
    normal_speed: jnp.ndarray  # f32[C, P] initial approach speed
    # Mutable accumulators (functional updates)
    normal_impulse: jnp.ndarray    # f32[C, P]
    tangent_impulse: jnp.ndarray   # f32[C, P, 2]
    total_normal_impulse: jnp.ndarray  # f32[C, P]

    def replace(self, **kw):
        return replace_dc(self, **kw)


def replace_dc(obj, **kw):
    from dataclasses import replace as _r

    return _r(obj, **kw)


def prepare_constraints(
    world: World,
    contacts: Contacts,
    s: SolverState,
    config: PhysicsConfig,
) -> ContactConstraints:
    """``prepare_contact_constraints`` (``plugin.rs:363-448``) +
    ``ContactConstraint::generate`` (``contact/mod.rs:110-220``)."""
    b = world.bodies
    ba, bb = contacts.body_a, contacts.body_b
    c = contacts.capacity

    dyn_a = s.solve_mask[ba] > 0.0
    dyn_b = s.solve_mask[bb] > 0.0
    solve = (
        contacts.active
        & contacts.touching
        & ~contacts.is_sensor
        & (dyn_a | dyn_b)
    )

    # Dominance (contact/mod.rs:127-148): higher dominance acts static.
    eff_dom = jnp.where(
        (b.body_type == types.BodyType.DYNAMIC) & ~b.sleeping, b.dominance, 127
    )
    rel_dom = eff_dom[ba] - eff_dom[bb]
    a_static = rel_dom > 0
    b_static = rel_dom < 0
    inv_mass_a = jnp.where(a_static[:, None], 0.0, s.inv_mass[ba])
    inv_inertia_a = jnp.where(a_static[:, None], 0.0, s.inv_inertia[ba])
    inv_mass_b = jnp.where(b_static[:, None], 0.0, s.inv_mass[bb])
    inv_inertia_b = jnp.where(b_static[:, None], 0.0, s.inv_inertia[bb])

    # Softness: stiffer for contacts against non-dynamic bodies.
    (dyn_soft, non_dyn_soft) = contact_softness(config)
    dyn_soft = jnp.asarray(dyn_soft, jnp.float32)
    non_dyn_soft = jnp.asarray(non_dyn_soft, jnp.float32)
    softness = jnp.where(
        (rel_dom != 0)[:, None], non_dyn_soft[None, :], dyn_soft[None, :]
    )

    # Tangent directions from relative linear velocity
    # (compute_tangent_directions, contact/mod.rs:427-449).
    n = contacts.normal
    force_dir = -n
    rel_v = b.lin_vel[ba] - b.lin_vel[bb]
    tang_v = rel_v - force_dir * vec.dot(force_dir, rel_v)[:, None]
    t1 = vec.normalize_or(tang_v, vec.any_orthonormal(force_dir))
    t2 = jnp.cross(force_dir, t1)

    # Per-point effective masses.
    r1 = contacts.anchor_a  # [C, P, 3]
    r2 = contacts.anchor_b
    im_sum = inv_mass_a + inv_mass_b  # [C, 3]
    n_p = n[:, None, :]

    r1xn = jnp.cross(r1, n_p)
    r2xn = jnp.cross(r2, n_p)
    k_normal = (
        vec.dot(n_p, im_sum[:, None, :] * n_p)
        + vec.dot(r1xn, sym3.mv(inv_inertia_a[:, None, :], r1xn))
        + vec.dot(r2xn, sym3.mv(inv_inertia_b[:, None, :], r2xn))
    )
    normal_mass = vec.safe_recip(k_normal)

    t1_p = t1[:, None, :]
    t2_p = t2[:, None, :]
    rt11 = jnp.cross(r1, t1_p)
    rt12 = jnp.cross(r2, t1_p)
    rt21 = jnp.cross(r1, t2_p)
    rt22 = jnp.cross(r2, t2_p)
    i1_rt11 = sym3.mv(inv_inertia_a[:, None, :], rt11)
    i2_rt12 = sym3.mv(inv_inertia_b[:, None, :], rt12)
    i1_rt21 = sym3.mv(inv_inertia_a[:, None, :], rt21)
    i2_rt22 = sym3.mv(inv_inertia_b[:, None, :], rt22)
    k1 = (
        vec.dot(t1_p, im_sum[:, None, :] * t1_p)
        + vec.dot(rt11, i1_rt11)
        + vec.dot(rt12, i2_rt12)
    )
    k2 = (
        vec.dot(t2_p, im_sum[:, None, :] * t2_p)
        + vec.dot(rt21, i1_rt21)
        + vec.dot(rt22, i2_rt22)
    )
    k12 = 2.0 * (vec.dot(rt11, i1_rt21) + vec.dot(rt12, i2_rt22))
    tangent_k = jnp.stack([k1, k2, k12], axis=-1)

    # Initial separation includes anchor offsets (contact/mod.rs:197).
    initial_separation = -contacts.penetration - vec.dot(r2 - r1, n_p)

    # Initial approach speed for restitution.
    v_a = s.lin_vel[ba][:, None, :] + jnp.cross(s.ang_vel[ba][:, None, :], r1)
    v_b = s.lin_vel[bb][:, None, :] + jnp.cross(s.ang_vel[bb][:, None, :], r2)
    normal_speed = vec.dot(v_b - v_a, n_p)

    point_mask = (
        (jnp.arange(MAX_POINTS)[None, :] < contacts.num_points[:, None])
        & solve[:, None]
    ).astype(jnp.float32)

    # Coloring on solvable pairs.
    color, _overflow = color_constraints(
        ba, bb, dyn_a, dyn_b, solve, b.capacity, config.max_colors
    )

    return ContactConstraints(
        body_a=ba,
        body_b=bb,
        mask=solve.astype(jnp.float32),
        color=color,
        normal=n,
        tangent1=t1,
        tangent2=t2,
        friction=contacts.friction,
        restitution=contacts.restitution,
        softness=softness,
        inv_mass_a=inv_mass_a,
        inv_mass_b=inv_mass_b,
        inv_inertia_a=inv_inertia_a,
        inv_inertia_b=inv_inertia_b,
        point_mask=point_mask,
        anchor_a=r1,
        anchor_b=r2,
        initial_separation=initial_separation,
        normal_mass=normal_mass,
        tangent_k=tangent_k,
        normal_speed=normal_speed,
        normal_impulse=contacts.normal_impulse,
        tangent_impulse=contacts.tangent_impulse,
        total_normal_impulse=jnp.zeros_like(contacts.normal_impulse),
    )


# ---------------------------------------------------------------------------
# Scatter helpers: apply per-constraint velocity deltas to bodies, color by
# color. Within a color writes are disjoint; the overflow color accumulates.
# ---------------------------------------------------------------------------


def _apply_deltas(s: SolverState, con, mask, d_lv_a, d_av_a, d_lv_b, d_av_b):
    m = mask[:, None]
    lin = s.lin_vel.at[con.body_a].add(d_lv_a * m).at[con.body_b].add(d_lv_b * m)
    ang = s.ang_vel.at[con.body_a].add(d_av_a * m).at[con.body_b].add(d_av_b * m)
    return s.replace(lin_vel=lin, ang_vel=ang)


def warm_start(s: SolverState, con: ContactConstraints, config) -> SolverState:
    """Apply previous impulses at substep start (``warm_start``,
    ``plugin.rs:453-515``, ``contact/mod.rs:224-262``).

    Warm starting is a fixed (velocity-independent) impulse application, so
    unlike the solve passes it needs no color sequencing: one masked
    scatter-add over all constraints accumulates correctly.
    """
    coeff = config.solver.warm_start_coefficient
    p = (
        con.normal_impulse[..., None] * con.normal[:, None, :]
        + con.tangent_impulse[..., 0:1] * con.tangent1[:, None, :]
        + con.tangent_impulse[..., 1:2] * con.tangent2[:, None, :]
    ) * (coeff * con.point_mask[..., None])
    p_sum = jnp.sum(p, axis=1)
    ang_a = jnp.sum(
        sym3.mv(con.inv_inertia_a[:, None, :], jnp.cross(con.anchor_a, p)),
        axis=1,
    )
    ang_b = jnp.sum(
        sym3.mv(con.inv_inertia_b[:, None, :], jnp.cross(con.anchor_b, p)),
        axis=1,
    )
    d_lv_a = -p_sum * con.inv_mass_a
    d_lv_b = p_sum * con.inv_mass_b
    return _apply_deltas(s, con, con.mask, d_lv_a, -ang_a, d_lv_b, ang_b)


def _num_colors(config: PhysicsConfig) -> int:
    return config.max_colors


def solve_pass(
    s: SolverState,
    con: ContactConstraints,
    h: float,
    use_bias: bool,
    config: PhysicsConfig,
):
    """One bias or relax pass over all colors (``solve_contacts``,
    ``plugin.rs:531-619``)."""
    max_overlap_speed = config.solver.max_overlap_solve_speed

    for c in range(_num_colors(config)):
        mask = con.mask * (con.color == c).astype(jnp.float32)
        s, con = _solve_color(s, con, mask, h, use_bias, max_overlap_speed)
    return s, con


def _solve_color(s, con, mask, h, use_bias, max_overlap_speed):
    """Solve all constraints (masked to one color): 4 normal points
    sequentially, then friction — exactly the reference's per-constraint
    point loops (``contact/mod.rs:267-354``)."""
    va = s.lin_vel[con.body_a]
    wa = s.ang_vel[con.body_a]
    vb = s.lin_vel[con.body_b]
    wb = s.ang_vel[con.body_b]

    dp_a = s.delta_pos[con.body_a]
    dp_b = s.delta_pos[con.body_b]
    from avian_tpu.math import quat as quat_m

    dq_a = s.delta_quat[con.body_a]
    dq_b = s.delta_quat[con.body_b]
    delta_translation = dp_b - dp_a

    n = con.normal
    bias_c = con.softness[:, 0]
    mass_c = con.softness[:, 1]
    imp_c = con.softness[:, 2]

    normal_impulse = con.normal_impulse
    total_impulse = con.total_normal_impulse

    d_va = jnp.zeros_like(va)
    d_wa = jnp.zeros_like(wa)
    d_vb = jnp.zeros_like(vb)
    d_wb = jnp.zeros_like(wb)

    # --- normal impulses, point by point -------------------------------
    for p in range(MAX_POINTS):
        r1 = con.anchor_a[:, p]
        r2 = con.anchor_b[:, p]
        pm = con.point_mask[:, p] * mask

        # Current separation from delta poses (contact/mod.rs:282-291).
        r1_rot = quat_m.rotate(dq_a, r1)
        r2_rot = quat_m.rotate(dq_b, r2)
        delta_sep = delta_translation + (r2_rot - r1_rot)
        separation = vec.dot(delta_sep, n) + con.initial_separation[:, p]

        # Relative velocity at fixed anchors.
        rv = (vb + d_vb + jnp.cross(wb + d_wb, r2)) - (
            va + d_va + jnp.cross(wa + d_wa, r1)
        )
        vn = vec.dot(rv, n)

        m_eff = con.normal_mass[:, p]
        imp_acc = normal_impulse[:, p]

        # Three branches (normal_part.rs:116-166).
        spec = -m_eff * (vn + separation / h)
        if use_bias:
            soft_bias = jnp.maximum(bias_c * separation, -max_overlap_speed)
            inner = -m_eff * mass_c * (vn + soft_bias) - imp_c * imp_acc
        else:
            inner = -m_eff * vn
        imp = jnp.where(separation > 0.0, spec, inner)

        new_acc = jnp.maximum(imp_acc + imp, 0.0)
        imp = (new_acc - imp_acc) * pm
        normal_impulse = normal_impulse.at[:, p].set(
            jnp.where(pm > 0, new_acc, imp_acc)
        )
        total_impulse = total_impulse.at[:, p].add(
            jnp.where(pm > 0, new_acc, 0.0)
        )

        pvec = imp[:, None] * n
        d_va = d_va - pvec * con.inv_mass_a
        d_wa = d_wa - sym3.mv(con.inv_inertia_a, jnp.cross(r1, pvec))
        d_vb = d_vb + pvec * con.inv_mass_b
        d_wb = d_wb + sym3.mv(con.inv_inertia_b, jnp.cross(r2, pvec))

    # --- friction, point by point ---------------------------------------
    tangent_impulse = con.tangent_impulse
    t1 = con.tangent1
    t2 = con.tangent2
    for p in range(MAX_POINTS):
        r1 = con.anchor_a[:, p]
        r2 = con.anchor_b[:, p]
        pm = con.point_mask[:, p] * mask

        rv = (vb + d_vb + jnp.cross(wb + d_wb, r2)) - (
            va + d_va + jnp.cross(wa + d_wa, r1)
        )
        vt1 = vec.dot(rv, t1)
        vt2 = vec.dot(rv, t2)

        k1 = con.tangent_k[:, p, 0]
        k2 = con.tangent_k[:, p, 1]
        k12 = con.tangent_k[:, p, 2]
        t11 = vt1 * vt1
        t22 = vt2 * vt2
        t12 = vt1 * vt2
        inv = t11 * k1 + t22 * k2 + t12 * k12
        m_eff = (t11 + t22) * vec.safe_recip(inv)
        m_eff = jnp.where(jnp.isfinite(m_eff), m_eff, 0.0)

        delta = m_eff[:, None] * jnp.stack([vt1, vt2], axis=-1)
        acc = tangent_impulse[:, p]
        limit = con.friction * normal_impulse[:, p]
        new_acc = vec.clamp_length_max(acc - delta, limit)
        imp2 = (new_acc - acc) * pm[:, None]
        tangent_impulse = tangent_impulse.at[:, p].set(
            jnp.where(pm[:, None] > 0, new_acc, acc)
        )

        pvec = imp2[:, 0:1] * t1 + imp2[:, 1:2] * t2
        d_va = d_va - pvec * con.inv_mass_a
        d_wa = d_wa - sym3.mv(con.inv_inertia_a, jnp.cross(r1, pvec))
        d_vb = d_vb + pvec * con.inv_mass_b
        d_wb = d_wb + sym3.mv(con.inv_inertia_b, jnp.cross(r2, pvec))

    s = _apply_deltas(s, con, mask, d_va, d_wa, d_vb, d_wb)
    con = con.replace(
        normal_impulse=normal_impulse,
        tangent_impulse=tangent_impulse,
        total_normal_impulse=total_impulse,
    )
    return s, con


def solve_restitution(
    s: SolverState, con: ContactConstraints, config: PhysicsConfig
):
    """Post-substep restitution (``apply_restitution``,
    ``contact/mod.rs:358-407``)."""
    threshold = config.solver.restitution_threshold * config.length_unit

    for _ in range(config.solver.restitution_iterations):
        for c in range(_num_colors(config)):
            mask = con.mask * (con.color == c).astype(jnp.float32)
            mask = mask * (con.restitution > 0.0)
            s, con = _restitution_color(s, con, mask, threshold)
    return s, con


def _restitution_color(s, con, mask, threshold):
    va = s.lin_vel[con.body_a]
    wa = s.ang_vel[con.body_a]
    vb = s.lin_vel[con.body_b]
    wb = s.ang_vel[con.body_b]
    n = con.normal

    normal_impulse = con.normal_impulse
    total_impulse = con.total_normal_impulse
    d_va = jnp.zeros_like(va)
    d_wa = jnp.zeros_like(wa)
    d_vb = jnp.zeros_like(vb)
    d_wb = jnp.zeros_like(wb)

    for p in range(MAX_POINTS):
        r1 = con.anchor_a[:, p]
        r2 = con.anchor_b[:, p]
        active = (
            (con.normal_speed[:, p] < -threshold)
            & (con.total_normal_impulse[:, p] > 0.0)
        )
        pm = con.point_mask[:, p] * mask * active

        rv = (vb + d_vb + jnp.cross(wb + d_wb, r2)) - (
            va + d_va + jnp.cross(wa + d_wa, r1)
        )
        vn = vec.dot(rv, n)
        imp = -con.normal_mass[:, p] * (
            vn + con.restitution * con.normal_speed[:, p]
        )
        acc = normal_impulse[:, p]
        new_acc = jnp.maximum(acc + imp, 0.0)
        imp = (new_acc - acc) * pm
        normal_impulse = normal_impulse.at[:, p].set(
            jnp.where(pm > 0, new_acc, acc)
        )
        total_impulse = total_impulse.at[:, p].add(imp)

        pvec = imp[:, None] * n
        d_va = d_va - pvec * con.inv_mass_a
        d_wa = d_wa - sym3.mv(con.inv_inertia_a, jnp.cross(r1, pvec))
        d_vb = d_vb + pvec * con.inv_mass_b
        d_wb = d_wb + sym3.mv(con.inv_inertia_b, jnp.cross(r2, pvec))

    s = _apply_deltas(s, con, mask, d_va, d_wa, d_vb, d_wb)
    con = con.replace(
        normal_impulse=normal_impulse, total_normal_impulse=total_impulse
    )
    return s, con


def store_impulses(contacts: Contacts, con: ContactConstraints) -> Contacts:
    """Persist accumulated impulses for next-step warm starting
    (``store_contact_impulses``, ``plugin.rs:722-755``)."""
    return contacts.replace(
        normal_impulse=con.normal_impulse,
        tangent_impulse=con.tangent_impulse,
        max_normal_impulse=con.total_normal_impulse,
    )
