"""2D TGS-soft contact solver with warm starting and graph coloring.

2D profile of ``pipeline/solver.py`` — same reference formulas
(``softness_parameters/mod.rs:64-79``, ``normal_part.rs:116-166``,
2D scalar tangent ``tangent_part.rs:189-204``), scalar angular math:
cross products become ``a.x*b.y - a.y*b.x``, the inverse inertia a scalar,
and the single tangent is ``perp(normal)``. Reuses the dimension-agnostic
persistent coloring (``pipeline/coloring.py``) and bucket compaction.
"""

from dataclasses import dataclass, fields, replace

import jax
import jax.numpy as jnp

from avian_tpu.core import types
from avian_tpu.core.config import PhysicsConfig
from avian_tpu.dim2.dynamics import SolverState2D
from avian_tpu.dim2.narrowphase import _perp, rot, rotate
from avian_tpu.dim2.state import Contacts2D, MAX_POINTS_2D, World2D
from avian_tpu.pipeline.coloring import color_constraints
from avian_tpu.pipeline.solver import _bucketize, contact_softness

# --- packed column layout --------------------------------------------------
_N = 0            # 0:2 normal
_FRICTION = 2
_SF = 3           # static friction
_RESTITUTION = 4
_SOFT = 5         # 5:8 (bias, mass_scale, impulse_scale)
_IMA = 8          # 8:10 per-axis inv mass a
_IMB = 10
_IIA = 12         # scalar inv inertia a
_IIB = 13
_AA = 14          # 14:18 anchors a (2 x 2)
_AB = 18          # 18:22 anchors b
_SEP = 22         # 22:24 initial separation per point
_NM = 24          # 24:26 normal effective mass per point
_TM = 26          # 26:28 tangent effective mass per point
_NS = 28          # 28:30 initial normal speed per point
_PM = 30          # 30:32 point mask
_SV = 32          # surface tangent speed (conveyor belts)
_D = 33

# imp[C, 6]: 0:2 normal impulse, 2:4 tangent impulse, 4:6 total normal.


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


def _cross2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _omega_perp(r):
    """Velocity at offset ``r`` under unit angular velocity:
    ``omega x r = (-r.y, r.x)`` (CCW perp — NOT ``_perp``, which is the CW
    perp used for outward polygon normals)."""
    return jnp.stack([-r[..., 1], r[..., 0]], axis=-1)


@_register
@dataclass(frozen=True)
class ContactConstraints2D:
    body_a: jnp.ndarray
    body_b: jnp.ndarray
    mask: jnp.ndarray
    color_c: jnp.ndarray
    base_imp: jnp.ndarray          # f32[C, 6]
    data: jnp.ndarray              # f32[colors, cap, D]
    imp: jnp.ndarray               # f32[colors, cap, 6]
    buckets: jnp.ndarray
    bucket_valid: jnp.ndarray
    bucket_a: jnp.ndarray
    bucket_b: jnp.ndarray
    relax: jnp.ndarray
    overflow_dropped: jnp.ndarray
    num_overflow: jnp.ndarray

    def replace(self, **kw):
        return replace(self, **kw)


def prepare_constraints(
    world: World2D,
    contacts: Contacts2D,
    s: SolverState2D,
    config: PhysicsConfig,
) -> ContactConstraints2D:
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

    eff_dom = jnp.where(
        (b.body_type == types.BodyType.DYNAMIC) & ~b.sleeping, b.dominance, 127
    )
    rel_dom = eff_dom[ba] - eff_dom[bb]
    a_static = rel_dom > 0
    b_static = rel_dom < 0
    inv_mass_a = jnp.where(a_static[:, None], 0.0, s.inv_mass[ba])
    inv_inertia_a = jnp.where(a_static, 0.0, s.inv_inertia[ba])
    inv_mass_b = jnp.where(b_static[:, None], 0.0, s.inv_mass[bb])
    inv_inertia_b = jnp.where(b_static, 0.0, s.inv_inertia[bb])

    (dyn_soft, non_dyn_soft) = contact_softness(config)
    dyn_soft = jnp.asarray(dyn_soft, jnp.float32)
    non_dyn_soft = jnp.asarray(non_dyn_soft, jnp.float32)
    softness = jnp.where(
        (rel_dom != 0)[:, None], non_dyn_soft[None, :], dyn_soft[None, :]
    )

    n = contacts.normal
    t = _perp(n)  # single 2D tangent

    r1 = contacts.anchor_a  # [C, P, 2]
    r2 = contacts.anchor_b
    im_sum = inv_mass_a + inv_mass_b  # [C, 2]
    n_p = n[:, None, :]
    t_p = t[:, None, :]

    r1xn = _cross2(r1, n_p)  # [C, P]
    r2xn = _cross2(r2, n_p)
    k_normal = (
        jnp.sum(n_p * (im_sum[:, None, :] * n_p), axis=-1)
        + inv_inertia_a[:, None] * r1xn * r1xn
        + inv_inertia_b[:, None] * r2xn * r2xn
    )
    normal_mass = jnp.where(k_normal > 1e-12, 1.0 / k_normal, 0.0)

    r1xt = _cross2(r1, t_p)
    r2xt = _cross2(r2, t_p)
    k_tangent = (
        jnp.sum(t_p * (im_sum[:, None, :] * t_p), axis=-1)
        + inv_inertia_a[:, None] * r1xt * r1xt
        + inv_inertia_b[:, None] * r2xt * r2xt
    )
    tangent_mass = jnp.where(k_tangent > 1e-12, 1.0 / k_tangent, 0.0)

    initial_separation = -contacts.penetration - jnp.sum(
        (r2 - r1) * n_p, axis=-1
    )

    # Initial approach speed for restitution.
    def pvel(body, r):
        v = s.lin_vel[body][:, None, :]
        w = s.ang_vel[body][:, None]
        return v + w[..., None] * _omega_perp(r)

    normal_speed = jnp.sum((pvel(bb, r2) - pvel(ba, r1)) * n_p, axis=-1)

    point_mask = (
        (jnp.arange(MAX_POINTS_2D)[None, :] < contacts.num_points[:, None])
        & solve[:, None]
    ).astype(jnp.float32)

    color, _ = color_constraints(
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

    last = buckets[-1]
    lvalid = bucket_valid[-1]
    la = jnp.where(lvalid & dyn_a[last], ba[last], b.capacity)
    lb = jnp.where(lvalid & dyn_b[last], bb[last], b.capacity)
    cnt = (
        jnp.zeros((b.capacity + 1,), jnp.float32)
        .at[la].add(1.0)
        .at[lb].add(1.0)
        .at[b.capacity].set(1.0)
    )
    mult = jnp.maximum(cnt[la], cnt[lb])
    relax_last = 1.0 / jnp.maximum(mult, 1.0)
    relax = (
        jnp.ones((config.max_colors, cap), jnp.float32).at[-1].set(relax_last)
    )
    num_overflow = jnp.sum(lvalid.astype(jnp.int32)) + dropped

    data = jnp.concatenate(
        [
            n,                                   # 0:2
            contacts.friction[:, None],          # 2
            contacts.static_friction[:, None],   # 3
            contacts.restitution[:, None],       # 4
            softness,                            # 5:8
            inv_mass_a,                          # 8:10
            inv_mass_b,                          # 10:12
            inv_inertia_a[:, None],              # 12
            inv_inertia_b[:, None],              # 13
            r1.reshape(c, 4),                    # 14:18
            r2.reshape(c, 4),                    # 18:22
            initial_separation,                  # 22:24
            normal_mass,                         # 24:26
            tangent_mass,                        # 26:28
            normal_speed,                        # 28:30
            point_mask,                          # 30:32
            contacts.surface_speed[:, None],     # 32
        ],
        axis=-1,
    )
    imp = jnp.concatenate(
        [
            contacts.normal_impulse,
            contacts.tangent_impulse,
            jnp.zeros((c, 2), jnp.float32),
        ],
        axis=-1,
    )

    data_b = data[buckets]
    data_b = data_b.at[:, :, _PM:_PM + 2].multiply(
        bucket_valid[:, :, None].astype(jnp.float32)
    )
    imp_b = imp[buckets]

    return ContactConstraints2D(
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
# Solve passes. Body state packing: [N, 6] = lin_vel(2), ang_vel, delta_pos(2),
# delta_angle.
# ---------------------------------------------------------------------------


def _pack(s: SolverState2D):
    return jnp.concatenate(
        [
            s.lin_vel,
            s.ang_vel[:, None],
            s.delta_pos,
            s.delta_angle[:, None],
        ],
        axis=-1,
    )


def _unpack(s: SolverState2D, st):
    return s.replace(lin_vel=st[:, 0:2], ang_vel=st[:, 2])


def warm_start(s: SolverState2D, con: ContactConstraints2D, config):
    coeff = config.solver.warm_start_coefficient
    d = con.data.reshape(-1, _D)
    n = d[:, _N:_N + 2]
    t = _perp(n)
    pm = d[:, _PM:_PM + 2]
    imp = con.imp.reshape(-1, 6)
    np_ = imp[:, 0:2] * pm
    tp = imp[:, 2:4] * pm

    p = (np_[..., None] * n[:, None, :] + tp[..., None] * t[:, None, :]) * coeff
    p_sum = jnp.sum(p, axis=1)
    r1 = d[:, _AA:_AA + 4].reshape(-1, 2, 2)
    r2 = d[:, _AB:_AB + 4].reshape(-1, 2, 2)
    ang_a = d[:, _IIA] * jnp.sum(_cross2(r1, p), axis=1)
    ang_b = d[:, _IIB] * jnp.sum(_cross2(r2, p), axis=1)
    d_a = jnp.concatenate(
        [-p_sum * d[:, _IMA:_IMA + 2], -ang_a[:, None]], -1
    )
    d_b = jnp.concatenate([p_sum * d[:, _IMB:_IMB + 2], ang_b[:, None]], -1)

    st = _pack(s)
    z3 = jnp.zeros((d_a.shape[0], 3), jnp.float32)
    # ONE fused scatter-add over both constraint sides (memop discipline).
    ab = jnp.concatenate(
        [con.bucket_a.reshape(-1), con.bucket_b.reshape(-1)]
    )
    st = st.at[ab].add(
        jnp.concatenate(
            [
                jnp.concatenate([d_a, z3], -1),
                jnp.concatenate([d_b, z3], -1),
            ],
            axis=0,
        )
    )
    return _unpack(s, st)


def solve_pass(
    s: SolverState2D,
    con: ContactConstraints2D,
    h: float,
    use_bias: bool,
    config: PhysicsConfig,
):
    st = _pack(s)
    max_overlap_speed = config.solver.max_overlap_solve_speed
    stiction_t2 = (
        config.solver.static_friction_speed_threshold * config.length_unit
    ) ** 2

    def body(state, x):
        d, irows, a, b, rlx = x
        state, new_d = _solve_bucket(
            state, d, irows, a, b, rlx, h, use_bias, max_overlap_speed,
            stiction_t2,
        )
        return state, new_d

    st, imp = jax.lax.scan(
        body, st, (con.data, con.imp, con.bucket_a, con.bucket_b, con.relax)
    )
    return (
        s.replace(lin_vel=st[:, 0:2], ang_vel=st[:, 2]),
        con.replace(imp=imp),
    )


def _solve_bucket(state, d, irows, a, b, relax, h, use_bias,
                  max_overlap_speed, stiction_t2):
    # ONE gather + ONE scatter per color round (both sides concatenated):
    # dependent-memop latency, not element count, is the cost on this
    # runtime (see pipeline/solver.py and BASELINE.md round-5 cost model).
    cap = a.shape[0]
    ab = jnp.concatenate([a, b])
    sab = state[ab]
    sa = sab[:cap]
    sb_ = sab[cap:]
    va, wa = sa[:, 0:2], sa[:, 2]
    vb, wb = sb_[:, 0:2], sb_[:, 2]
    dth_a = sa[:, 5]
    dth_b = sb_[:, 5]
    delta_translation = sb_[:, 3:5] - sa[:, 3:5]

    n = d[:, _N:_N + 2]
    t = _perp(n)
    soft_bias = d[:, _SOFT]
    soft_mass = d[:, _SOFT + 1]
    soft_imp = d[:, _SOFT + 2]
    ima = d[:, _IMA:_IMA + 2]
    imb = d[:, _IMB:_IMB + 2]
    iia = d[:, _IIA]
    iib = d[:, _IIB]

    ca_, sa_ = rot(dth_a)
    cb_, sb2 = rot(dth_b)

    d_va = jnp.zeros_like(va)
    d_wa = jnp.zeros_like(wa)
    d_vb = jnp.zeros_like(vb)
    d_wb = jnp.zeros_like(wb)

    np_new = []
    total_new = []
    for p in range(MAX_POINTS_2D):
        r1 = d[:, _AA + 2 * p:_AA + 2 * p + 2]
        r2 = d[:, _AB + 2 * p:_AB + 2 * p + 2]
        pm = d[:, _PM + p]

        delta_sep = delta_translation + (
            rotate(cb_, sb2, r2) - rotate(ca_, sa_, r1)
        )
        separation = jnp.sum(delta_sep * n, axis=-1) + d[:, _SEP + p]

        rv = (vb + d_vb + (wb + d_wb)[:, None] * _omega_perp(r2)) - (
            va + d_va + (wa + d_wa)[:, None] * _omega_perp(r1)
        )
        vn = jnp.sum(rv * n, axis=-1)

        m_eff = d[:, _NM + p]
        acc = irows[:, p]

        spec = -m_eff * (vn + separation / h)
        if use_bias:
            sb3 = jnp.maximum(soft_bias * separation, -max_overlap_speed)
            inner = -m_eff * soft_mass * (vn + sb3) - soft_imp * acc
        else:
            inner = -m_eff * vn
        delta = jnp.where(separation > 0.0, spec, inner)

        new_acc = jnp.maximum(acc + relax * delta, 0.0)
        applied = (new_acc - acc) * pm
        np_new.append(jnp.where(pm > 0, new_acc, acc))
        total_new.append(irows[:, 4 + p] + jnp.where(pm > 0, new_acc, 0.0))

        pvec = applied[:, None] * n
        d_va = d_va - pvec * ima
        d_wa = d_wa - iia * _cross2(r1, pvec)
        d_vb = d_vb + pvec * imb
        d_wb = d_wb + iib * _cross2(r2, pvec)

    np_new = jnp.stack(np_new, axis=-1)
    total_new = jnp.stack(total_new, axis=-1)

    friction = d[:, _FRICTION]
    static_friction = d[:, _SF]
    tp_new = []
    for p in range(MAX_POINTS_2D):
        r1 = d[:, _AA + 2 * p:_AA + 2 * p + 2]
        r2 = d[:, _AB + 2 * p:_AB + 2 * p + 2]
        pm = d[:, _PM + p]

        rv = (vb + d_vb + (wb + d_wb)[:, None] * _omega_perp(r2)) - (
            va + d_va + (wa + d_wa)[:, None] * _omega_perp(r1)
        )
        vt = jnp.sum(rv * t, axis=-1) + d[:, _SV]

        m_eff = d[:, _TM + p]
        delta = m_eff * vt
        acc = irows[:, 2 + p]
        mu = jnp.where(vt * vt <= stiction_t2, static_friction, friction)
        limit = mu * np_new[:, p]
        new_acc = jnp.clip(acc - relax * delta, -limit, limit)
        applied = (new_acc - acc) * pm
        tp_new.append(jnp.where(pm > 0, new_acc, acc))

        pvec = applied[:, None] * t
        d_va = d_va - pvec * ima
        d_wa = d_wa - iia * _cross2(r1, pvec)
        d_vb = d_vb + pvec * imb
        d_wb = d_wb + iib * _cross2(r2, pvec)

    new_irows = jnp.concatenate(
        [np_new, jnp.stack(tp_new, -1), total_new], axis=-1
    )
    z3 = jnp.zeros((d_va.shape[0], 3), jnp.float32)
    state = state.at[ab].add(
        jnp.concatenate(
            [
                jnp.concatenate([d_va, d_wa[:, None], z3], -1),
                jnp.concatenate([d_vb, d_wb[:, None], z3], -1),
            ],
            axis=0,
        )
    )
    return state, new_irows


def solve_restitution(
    s: SolverState2D, con: ContactConstraints2D, config: PhysicsConfig
):
    threshold = config.solver.restitution_threshold * config.length_unit
    st = _pack(s)
    imp = con.imp

    def body(v, x):
        d, irows, a, b, rlx = x
        v, new_d = _restitution_bucket(v, d, irows, a, b, rlx, threshold)
        return v, new_d

    for _ in range(config.solver.restitution_iterations):
        st, imp = jax.lax.scan(
            body, st, (con.data, imp, con.bucket_a, con.bucket_b, con.relax)
        )
    return _unpack(s, st), con.replace(imp=imp)


def _restitution_bucket(st, d, irows, a, b, relax, threshold):
    vmask = (d[:, _RESTITUTION] > 0.0).astype(jnp.float32)
    cap = a.shape[0]
    ab = jnp.concatenate([a, b])
    sab = st[ab]
    sa = sab[:cap]
    sb_ = sab[cap:]
    va, wa = sa[:, 0:2], sa[:, 2]
    vb, wb = sb_[:, 0:2], sb_[:, 2]
    n = d[:, _N:_N + 2]
    restitution = d[:, _RESTITUTION]
    ima = d[:, _IMA:_IMA + 2]
    imb = d[:, _IMB:_IMB + 2]
    iia = d[:, _IIA]
    iib = d[:, _IIB]

    d_va = jnp.zeros_like(va)
    d_wa = jnp.zeros_like(wa)
    d_vb = jnp.zeros_like(vb)
    d_wb = jnp.zeros_like(wb)

    np_new = []
    total_new = []
    for p in range(MAX_POINTS_2D):
        r1 = d[:, _AA + 2 * p:_AA + 2 * p + 2]
        r2 = d[:, _AB + 2 * p:_AB + 2 * p + 2]
        ns = d[:, _NS + p]
        active = (ns < -threshold) & (irows[:, 4 + p] > 0.0)
        pm = d[:, _PM + p] * vmask * active

        rv = (vb + d_vb + (wb + d_wb)[:, None] * _omega_perp(r2)) - (
            va + d_va + (wa + d_wa)[:, None] * _omega_perp(r1)
        )
        vn = jnp.sum(rv * n, axis=-1)
        delta = -d[:, _NM + p] * (vn + restitution * ns)
        acc = irows[:, p]
        new_acc = jnp.maximum(acc + relax * delta, 0.0)
        applied = (new_acc - acc) * pm
        np_new.append(jnp.where(pm > 0, new_acc, acc))
        total_new.append(irows[:, 4 + p] + applied)

        pvec = applied[:, None] * n
        d_va = d_va - pvec * ima
        d_wa = d_wa - iia * _cross2(r1, pvec)
        d_vb = d_vb + pvec * imb
        d_wb = d_wb + iib * _cross2(r2, pvec)

    new_irows = jnp.concatenate(
        [jnp.stack(np_new, -1), irows[:, 2:4], jnp.stack(total_new, -1)],
        axis=-1,
    )
    st = st.at[ab].add(
        jnp.concatenate(
            [
                jnp.concatenate(
                    [d_va, d_wa[:, None], jnp.zeros((d_va.shape[0], 3))], -1
                ),
                jnp.concatenate(
                    [d_vb, d_wb[:, None], jnp.zeros((d_vb.shape[0], 3))], -1
                ),
            ],
            axis=0,
        )
    )
    return st, new_irows


def store_impulses(
    contacts: Contacts2D, con: ContactConstraints2D
) -> Contacts2D:
    c = contacts.capacity
    flat_idx = jnp.where(
        con.bucket_valid.reshape(-1), con.buckets.reshape(-1), c
    )
    imp = con.base_imp.at[flat_idx].set(con.imp.reshape(-1, 6), mode="drop")
    return contacts.replace(
        normal_impulse=imp[:, 0:2],
        tangent_impulse=imp[:, 2:4],
        max_normal_impulse=imp[:, 4:6],
        color=con.color_c,
    )
