"""TGS-soft contact constraint solver with warm starting and graph coloring.

Faithful TPU-native re-derivation of the reference's substepped impulse
solver (``src/dynamics/solver/``): soft-constraint normal impulses with
bias/mass/impulse coefficients (``softness_parameters/mod.rs:64-79``),
speculative-contact branch, simultaneous two-axis Coulomb friction
(``contact/tangent_part.rs``), a bias + relax two-pass scheme per substep
(``plugin.rs:27-36``), and a post-substep restitution pass
(``contact/mod.rs:358-407``).

TPU-native structure (kernel-count-conscious — on TPU each unfused HLO op is
a launch, so the design minimizes ops and memory round-trips):

- All static per-constraint data is packed into ONE matrix ``data[C, D]``
  and all mutable impulse state into ``imp[C, 16]``, so a solve pass does a
  single gather per table instead of ~20 small ones.
- Constraints are bucketed by color into fixed-capacity index buckets
  ``buckets[num_colors, cap]``; the solve is a ``lax.scan`` over colors whose
  body gathers only that color's rows (compute ∝ C·factor/num_colors per
  sweep, one traced body instead of an unrolled per-color graph).
- Body velocity state is packed to ``vw[N, 6]`` per pass (one gather/scatter
  per constraint side).

Within a color no two constraints share a dynamic body (see
``pipeline.coloring``), so the scatters are provably disjoint — the same
guarantee the reference's graph coloring gives its ``par_for_each``
(``plugin.rs:494-505``). Bucket-overflow constraints land in the last color,
where scatter-adds accumulate (Jacobi-style, the analogue of the reference's
serial overflow color).
"""

import math
from dataclasses import dataclass, fields, replace

import jax
import jax.numpy as jnp

from avian_tpu.core import types
from avian_tpu.core.config import PhysicsConfig
from avian_tpu.core.state import Contacts, World, MAX_POINTS
from avian_tpu.math import quat as quat_m
from avian_tpu.math import sym3, vec
from avian_tpu.pipeline.coloring import color_constraints
from avian_tpu.pipeline.solver_body import SolverState

# --- packed column layout ---------------------------------------------------
# data[C, D]:
_N = 0            # 0:3   normal
_T1 = 3           # 3:6   tangent1
_T2 = 6           # 6:9   tangent2
_FRICTION = 9
_RESTITUTION = 10
_SOFT = 11        # 11:14 (bias, mass_scale, impulse_scale)
_IMA = 14         # 14:17 inv mass a (per axis)
_IMB = 17
_IIA = 20         # 20:26 inv inertia a (sym6)
_IIB = 26
_AA = 32          # 32:44 anchors a (4 x 3)
_AB = 44          # 44:56 anchors b
_SEP = 56         # 56:60 initial separation per point
_NM = 60          # 60:64 normal effective mass per point
_TK = 64          # 64:76 tangent k1,k2,k12 per point
_NS = 76          # 76:80 initial normal speed per point
_PM = 80          # 80:84 point mask per point
_SV = 84          # 84:87 surface velocity (conveyor belts)
_SF = 87          # static friction coefficient (stiction)
_D = 88

# imp[C, 16]: 0:4 normal impulse, 4:12 tangent impulse (4 x 2), 12:16 total.


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
    """Transient per-step contact constraints, packed + color-bucketed."""

    body_a: jnp.ndarray   # i32[C]
    body_b: jnp.ndarray   # i32[C]
    mask: jnp.ndarray     # f32[C]
    color_c: jnp.ndarray  # i32[C] per-constraint color (persisted to Contacts)
    base_imp: jnp.ndarray  # f32[C, 16] impulses for constraints in no bucket
    data: jnp.ndarray     # f32[num_colors, cap, D] color-bucketed static data
    imp: jnp.ndarray      # f32[num_colors, cap, 16] bucketed mutable impulses
    buckets: jnp.ndarray       # i32[num_colors, cap] constraint indices
    bucket_valid: jnp.ndarray  # bool[num_colors, cap]
    bucket_a: jnp.ndarray      # i32[num_colors, cap] prepacked body a
    bucket_b: jnp.ndarray      # i32[num_colors, cap] prepacked body b
    relax: jnp.ndarray         # f32[num_colors, cap] impulse under-relaxation
    overflow_dropped: jnp.ndarray  # i32[] constraints that fit no bucket
    num_overflow: jnp.ndarray      # i32[] constraints in the overflow color

    def replace(self, **kw):
        return replace(self, **kw)


def _bucketize(color, active_mask, num_colors, cap):
    """Fixed-capacity per-color index buckets via one stable sort.

    Constraints whose color bucket is full go to the LAST color's remaining
    space; if that is full too they are dropped (counted)."""
    c = color.shape[0]
    key = jnp.where(active_mask, color, num_colors)
    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    # Rank within the color run via cummax run-start (NOT searchsorted:
    # its binary search is ~17 dependent gather rounds ~= 5 ms/step on
    # this runtime; cummax is one op).
    idx = jnp.arange(c)
    new_run = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(new_run, idx, 0))
    rank = idx - run_start
    in_cap = (rank < cap) & (sorted_key < num_colors)
    slot = jnp.clip(sorted_key, 0, num_colors - 1) * cap + rank
    slot = jnp.where(in_cap, slot, num_colors * cap)  # dropped -> sentinel

    flat = jnp.full((num_colors * cap + 1,), c, jnp.int32)
    flat = flat.at[slot].set(order.astype(jnp.int32), mode="drop")
    buckets = flat[:-1].reshape(num_colors, cap)
    valid = buckets < c
    buckets = jnp.where(valid, buckets, 0)
    dropped = jnp.sum((sorted_key < num_colors) & ~in_cap)
    return buckets, valid, dropped


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

    # Coloring + bucketing on solvable pairs (persistent colors).
    color, _overflow = color_constraints(
        ba, bb, dyn_a, dyn_b, solve, b.capacity, config.max_colors,
        prev_color=contacts.color,
    )
    cap = max(
        1,
        int(config.color_bucket_factor * c + config.max_colors - 1)
        // config.max_colors,
    )
    buckets, bucket_valid, dropped = _bucketize(
        color, solve, config.max_colors, cap
    )

    # Overflow under-relaxation: within the last (overflow) color,
    # constraints MAY share a dynamic body, so the parallel scatter-add
    # impulse updates are scaled by 1/(max per-body multiplicity) — the
    # convergent averaged-Jacobi analogue of the reference's *serially*
    # solved overflow color (``constraint_graph.rs:44-48``). All other
    # colors are conflict-free by construction (relax = 1).
    last = buckets[-1]
    lvalid = bucket_valid[-1]
    la = jnp.where(lvalid & dyn_a[last], ba[last], b.capacity)
    lb = jnp.where(lvalid & dyn_b[last], bb[last], b.capacity)
    cnt = (
        jnp.zeros((b.capacity + 1,), jnp.float32)
        .at[la].add(1.0)
        .at[lb].add(1.0)
        .at[b.capacity].set(1.0)  # sentinel: static/padded endpoints
    )
    mult = jnp.maximum(cnt[la], cnt[lb])
    relax_last = 1.0 / jnp.maximum(mult, 1.0)
    relax = (
        jnp.ones((config.max_colors, cap), jnp.float32).at[-1].set(relax_last)
    )
    num_overflow = jnp.sum(lvalid.astype(jnp.int32)) + dropped

    data = jnp.concatenate(
        [
            n,                                   # 0:3
            t1,                                  # 3:6
            t2,                                  # 6:9
            contacts.friction[:, None],          # 9
            contacts.restitution[:, None],       # 10
            softness,                            # 11:14
            inv_mass_a,                          # 14:17
            inv_mass_b,                          # 17:20
            inv_inertia_a,                       # 20:26
            inv_inertia_b,                       # 26:32
            r1.reshape(c, 12),                   # 32:44
            r2.reshape(c, 12),                   # 44:56
            initial_separation,                  # 56:60
            normal_mass,                         # 60:64
            jnp.stack([k1, k2, k12], axis=-1).reshape(c, 12),  # 64:76
            normal_speed,                        # 76:80
            point_mask,                          # 80:84
            contacts.surface_velocity,           # 84:87
            contacts.static_friction[:, None],   # 87
        ],
        axis=-1,
    )

    imp = jnp.concatenate(
        [
            contacts.normal_impulse,
            contacts.tangent_impulse.reshape(c, 8),
            jnp.zeros((c, 4), jnp.float32),
        ],
        axis=-1,
    )

    # Bucket the packed tables by color once, so every solve pass reads its
    # color's constraint rows SEQUENTIALLY (streamed, fused) instead of
    # through a random HBM gather — the gathers that remain touch only the
    # small per-body state. Bucket masks are baked into the point masks.
    data_b = data[buckets]
    data_b = data_b.at[:, :, _PM:_PM + 4].multiply(
        bucket_valid[:, :, None].astype(jnp.float32)
    )
    imp_b = imp[buckets]

    return ContactConstraints(
        body_a=ba,
        body_b=bb,
        mask=solve.astype(jnp.float32),
        color_c=jnp.where(solve, color, -1),
        base_imp=imp,
        data=data_b,
        imp=imp_b,
        buckets=buckets,
        bucket_valid=bucket_valid,
        bucket_a=ba[buckets],
        bucket_b=bb[buckets],
        relax=relax,
        overflow_dropped=dropped,
        num_overflow=num_overflow,
    )


# ---------------------------------------------------------------------------
# Solve passes
# ---------------------------------------------------------------------------


def _pack_vw(s: SolverState):
    return jnp.concatenate([s.lin_vel, s.ang_vel], axis=-1)


def _unpack_vw(s: SolverState, vw):
    return s.replace(lin_vel=vw[:, 0:3], ang_vel=vw[:, 3:6])


def warm_start(s: SolverState, con: ContactConstraints, config) -> SolverState:
    """Apply previous impulses at substep start (``warm_start``,
    ``plugin.rs:453-515``). Velocity-independent, so one masked scatter-add
    over all constraints suffices (no color sequencing needed)."""
    coeff = config.solver.warm_start_coefficient
    d = con.data.reshape(-1, _D)
    n = d[:, _N:_N + 3]
    t1 = d[:, _T1:_T1 + 3]
    t2 = d[:, _T2:_T2 + 3]
    pm = d[:, _PM:_PM + 4]
    imp = con.imp.reshape(-1, 16)
    np_ = imp[:, 0:4] * pm
    tp = imp[:, 4:12].reshape(-1, 4, 2) * pm[..., None]

    p = (
        np_[..., None] * n[:, None, :]
        + tp[..., 0:1] * t1[:, None, :]
        + tp[..., 1:2] * t2[:, None, :]
    ) * coeff
    p_sum = jnp.sum(p, axis=1)
    r1 = d[:, _AA:_AA + 12].reshape(-1, 4, 3)
    r2 = d[:, _AB:_AB + 12].reshape(-1, 4, 3)
    ang_a = jnp.sum(
        sym3.mv(d[:, None, _IIA:_IIA + 6], jnp.cross(r1, p)), axis=1
    )
    ang_b = jnp.sum(
        sym3.mv(d[:, None, _IIB:_IIB + 6], jnp.cross(r2, p)), axis=1
    )
    d_a = jnp.concatenate([-p_sum * d[:, _IMA:_IMA + 3], -ang_a], -1)
    d_b = jnp.concatenate([p_sum * d[:, _IMB:_IMB + 3], ang_b], -1)

    vw = _pack_vw(s)
    # ONE fused scatter-add over both sides: on this runtime each dependent
    # memory op costs ~0.25 ms regardless of size (tools/micro_bench.py), so
    # halving the op count halves the pass.
    ab = jnp.concatenate([con.bucket_a.reshape(-1), con.bucket_b.reshape(-1)])
    vw = vw.at[ab].add(jnp.concatenate([d_a, d_b], axis=0))
    return _unpack_vw(s, vw)


def solve_pass(
    s: SolverState,
    con: ContactConstraints,
    h: float,
    use_bias: bool,
    config: PhysicsConfig,
):
    """One bias or relax pass: ``lax.scan`` over color buckets
    (``solve_contacts``, ``plugin.rs:531-619``)."""
    # Fused body state: velocities (mutable in this pass) + delta pose
    # (read-only here) in one [N, 13] table -> 2 gathers per bucket side.
    state = jnp.concatenate(
        [s.lin_vel, s.ang_vel, s.delta_pos, s.delta_quat], axis=-1
    )
    max_overlap_speed = config.solver.max_overlap_solve_speed
    stiction_t2 = (
        config.solver.static_friction_speed_threshold * config.length_unit
    ) ** 2

    # lax.scan over colors: one traced bucket body, compiled once. (Measured
    # on this runtime: the scanned color loop runs ~4x FASTER than unrolled
    # straight-line gathers and compiles ~12x smaller programs.)
    def body(st, x):
        d, irows, a, b, rlx = x
        st, new_d = _solve_bucket(
            st, d, irows, a, b, rlx, h, use_bias, max_overlap_speed,
            stiction_t2,
        )
        return st, new_d

    state, imp = jax.lax.scan(
        body,
        state,
        (con.data, con.imp, con.bucket_a, con.bucket_b, con.relax),
    )
    return (
        s.replace(lin_vel=state[:, 0:3], ang_vel=state[:, 3:6]),
        con.replace(imp=imp),
    )


def _solve_bucket(state, d, irows, a, b, relax, h, use_bias,
                  max_overlap_speed, stiction_t2):
    """Solve one color bucket: 4 normal points sequentially, then friction —
    the reference's per-constraint point loops (``contact/mod.rs:267-354``),
    vectorized across the bucket. Bucket validity is baked into the point
    masks at prepare time.

    Memop discipline: ONE gather and ONE scatter-add per color round (both
    sides concatenated). Dependent gather/scatter latency (~0.25 ms/op on
    this runtime, tools/micro_bench.py) dominates the substep loop, so the
    round's memop count — not its element count — is the cost."""
    cap = a.shape[0]
    ab = jnp.concatenate([a, b])
    sab = state[ab]
    sa = sab[:cap]
    sb = sab[cap:]
    va, wa = sa[:, 0:3], sa[:, 3:6]
    vb, wb = sb[:, 0:3], sb[:, 3:6]
    dq_a = sa[:, 9:13]
    dq_b = sb[:, 9:13]
    delta_translation = sb[:, 6:9] - sa[:, 6:9]

    n = d[:, _N:_N + 3]
    soft_bias = d[:, _SOFT]
    soft_mass = d[:, _SOFT + 1]
    soft_imp = d[:, _SOFT + 2]
    ima = d[:, _IMA:_IMA + 3]
    imb = d[:, _IMB:_IMB + 3]
    iia = d[:, _IIA:_IIA + 6]
    iib = d[:, _IIB:_IIB + 6]

    d_va = jnp.zeros_like(va)
    d_wa = jnp.zeros_like(wa)
    d_vb = jnp.zeros_like(vb)
    d_wb = jnp.zeros_like(wb)

    np_new = []
    total_new = []
    for p in range(MAX_POINTS):
        r1 = d[:, _AA + 3 * p:_AA + 3 * p + 3]
        r2 = d[:, _AB + 3 * p:_AB + 3 * p + 3]
        pm = d[:, _PM + p]

        # Current separation from delta poses (contact/mod.rs:282-291).
        delta_sep = delta_translation + (
            quat_m.rotate(dq_b, r2) - quat_m.rotate(dq_a, r1)
        )
        separation = vec.dot(delta_sep, n) + d[:, _SEP + p]

        rv = (vb + d_vb + jnp.cross(wb + d_wb, r2)) - (
            va + d_va + jnp.cross(wa + d_wa, r1)
        )
        vn = vec.dot(rv, n)

        m_eff = d[:, _NM + p]
        acc = irows[:, p]

        spec = -m_eff * (vn + separation / h)
        if use_bias:
            sb = jnp.maximum(soft_bias * separation, -max_overlap_speed)
            inner = -m_eff * soft_mass * (vn + sb) - soft_imp * acc
        else:
            inner = -m_eff * vn
        delta = jnp.where(separation > 0.0, spec, inner)

        new_acc = jnp.maximum(acc + relax * delta, 0.0)
        applied = (new_acc - acc) * pm
        np_new.append(jnp.where(pm > 0, new_acc, acc))
        total_new.append(irows[:, 12 + p] + jnp.where(pm > 0, new_acc, 0.0))

        pvec = applied[:, None] * n
        d_va = d_va - pvec * ima
        d_wa = d_wa - sym3.mv(iia, jnp.cross(r1, pvec))
        d_vb = d_vb + pvec * imb
        d_wb = d_wb + sym3.mv(iib, jnp.cross(r2, pvec))

    np_new = jnp.stack(np_new, axis=-1)
    total_new = jnp.stack(total_new, axis=-1)

    t1 = d[:, _T1:_T1 + 3]
    t2 = d[:, _T2:_T2 + 3]
    friction = d[:, _FRICTION]
    static_friction = d[:, _SF]
    tp_new = []
    for p in range(MAX_POINTS):
        r1 = d[:, _AA + 3 * p:_AA + 3 * p + 3]
        r2 = d[:, _AB + 3 * p:_AB + 3 * p + 3]
        pm = d[:, _PM + p]

        # Friction sees the surface velocity (tangent_velocity, the
        # conveyor-belt term; tangent_part.rs:206-210).
        rv = (vb + d_vb + jnp.cross(wb + d_wb, r2)) - (
            va + d_va + jnp.cross(wa + d_wa, r1)
        ) + d[:, _SV:_SV + 3]
        vt1 = vec.dot(rv, t1)
        vt2 = vec.dot(rv, t2)

        k1 = d[:, _TK + 3 * p]
        k2 = d[:, _TK + 3 * p + 1]
        k12 = d[:, _TK + 3 * p + 2]
        t11 = vt1 * vt1
        t22 = vt2 * vt2
        t12 = vt1 * vt2
        inv = t11 * k1 + t22 * k2 + t12 * k12
        m_eff = (t11 + t22) * vec.safe_recip(inv)
        m_eff = jnp.where(jnp.isfinite(m_eff), m_eff, 0.0)

        delta = m_eff[:, None] * jnp.stack([vt1, vt2], axis=-1)
        acc = irows[:, 4 + 2 * p:6 + 2 * p]
        # Stiction: below the threshold tangential speed the static
        # coefficient bounds the Coulomb cone; above it the dynamic one
        # does (``physics_material.rs:137-146`` split honored in-solve).
        mu = jnp.where(
            vt1 * vt1 + vt2 * vt2 <= stiction_t2, static_friction, friction
        )
        limit = mu * np_new[:, p]
        new_acc = vec.clamp_length_max(acc - relax[:, None] * delta, limit)
        applied = (new_acc - acc) * pm[:, None]
        tp_new.append(jnp.where(pm[:, None] > 0, new_acc, acc))

        pvec = applied[:, 0:1] * t1 + applied[:, 1:2] * t2
        d_va = d_va - pvec * ima
        d_wa = d_wa - sym3.mv(iia, jnp.cross(r1, pvec))
        d_vb = d_vb + pvec * imb
        d_wb = d_wb + sym3.mv(iib, jnp.cross(r2, pvec))

    new_irows = jnp.concatenate(
        [np_new, jnp.concatenate(tp_new, axis=-1), total_new], axis=-1
    )

    z7 = jnp.zeros((d_va.shape[0], 7), jnp.float32)
    delta = jnp.concatenate(
        [
            jnp.concatenate([d_va, d_wa, z7], -1),
            jnp.concatenate([d_vb, d_wb, z7], -1),
        ],
        axis=0,
    )
    state = state.at[ab].add(delta)
    return state, new_irows


def solve_restitution(
    s: SolverState, con: ContactConstraints, config: PhysicsConfig
):
    """Post-substep restitution (``apply_restitution``,
    ``contact/mod.rs:358-407``), scanned over color buckets."""
    threshold = config.solver.restitution_threshold * config.length_unit
    vw = _pack_vw(s)
    imp = con.imp

    def body(v, x):
        d, irows, a, b, rlx = x
        v, new_d = _restitution_bucket(v, d, irows, a, b, rlx, threshold)
        return v, new_d

    for _ in range(config.solver.restitution_iterations):
        vw, imp = jax.lax.scan(
            body,
            vw,
            (con.data, imp, con.bucket_a, con.bucket_b, con.relax),
        )
    return _unpack_vw(s, vw), con.replace(imp=imp)


def _restitution_bucket(vw, d, irows, a, b, relax, threshold):
    vmask = (d[:, _RESTITUTION] > 0.0).astype(jnp.float32)

    cap = a.shape[0]
    ab = jnp.concatenate([a, b])
    vwab = vw[ab]
    vwa = vwab[:cap]
    vwb = vwab[cap:]
    va, wa = vwa[:, 0:3], vwa[:, 3:6]
    vb, wb = vwb[:, 0:3], vwb[:, 3:6]
    n = d[:, _N:_N + 3]
    restitution = d[:, _RESTITUTION]
    ima = d[:, _IMA:_IMA + 3]
    imb = d[:, _IMB:_IMB + 3]
    iia = d[:, _IIA:_IIA + 6]
    iib = d[:, _IIB:_IIB + 6]

    d_va = jnp.zeros_like(va)
    d_wa = jnp.zeros_like(wa)
    d_vb = jnp.zeros_like(vb)
    d_wb = jnp.zeros_like(wb)

    np_new = []
    total_new = []
    for p in range(MAX_POINTS):
        r1 = d[:, _AA + 3 * p:_AA + 3 * p + 3]
        r2 = d[:, _AB + 3 * p:_AB + 3 * p + 3]
        ns = d[:, _NS + p]
        active = (ns < -threshold) & (irows[:, 12 + p] > 0.0)
        pm = d[:, _PM + p] * vmask * active

        rv = (vb + d_vb + jnp.cross(wb + d_wb, r2)) - (
            va + d_va + jnp.cross(wa + d_wa, r1)
        )
        vn = vec.dot(rv, n)
        delta = -d[:, _NM + p] * (vn + restitution * ns)
        acc = irows[:, p]
        new_acc = jnp.maximum(acc + relax * delta, 0.0)
        applied = (new_acc - acc) * pm
        np_new.append(jnp.where(pm > 0, new_acc, acc))
        total_new.append(irows[:, 12 + p] + applied)

        pvec = applied[:, None] * n
        d_va = d_va - pvec * ima
        d_wa = d_wa - sym3.mv(iia, jnp.cross(r1, pvec))
        d_vb = d_vb + pvec * imb
        d_wb = d_wb + sym3.mv(iib, jnp.cross(r2, pvec))

    new_irows = jnp.concatenate(
        [
            jnp.stack(np_new, -1),
            irows[:, 4:12],
            jnp.stack(total_new, -1),
        ],
        axis=-1,
    )
    vw = vw.at[ab].add(
        jnp.concatenate(
            [
                jnp.concatenate([d_va, d_wa], -1),
                jnp.concatenate([d_vb, d_wb], -1),
            ],
            axis=0,
        )
    )
    return vw, new_irows


def store_impulses(contacts: Contacts, con: ContactConstraints) -> Contacts:
    """Persist accumulated impulses for next-step warm starting
    (``store_contact_impulses``, ``plugin.rs:722-755``)."""
    c = contacts.capacity
    flat_idx = jnp.where(
        con.bucket_valid.reshape(-1), con.buckets.reshape(-1), c
    )
    imp = con.base_imp.at[flat_idx].set(con.imp.reshape(-1, 16), mode="drop")
    return contacts.replace(
        normal_impulse=imp[:, 0:4],
        tangent_impulse=imp[:, 4:12].reshape(c, 4, 2),
        max_normal_impulse=imp[:, 12:16],
        color=con.color_c,
    )
