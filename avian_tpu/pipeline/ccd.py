"""Swept CCD: conservative-advancement time-of-impact rewind.

Counterpart of the reference's opt-in ``SweptCcd``
(``src/dynamics/ccd/mod.rs:389-419,523-687``): after the substep loop,
bodies flagged for swept CCD compute the earliest time of impact along their
accumulated delta position against every other collider, and their delta
position is rewound to ``TOI * (1 + epsilon)`` so the next step's speculative
contacts resolve the impact instead of tunneling.

Speculative contacts (the default CCD, ``NarrowPhaseConfig`` speculative
margins) are handled in the narrowphase; this pass is only for the opt-in
sweep.

TPU shape: only up to ``config.max_swept_colliders`` flagged colliders are
swept (gathered by ``top_k``), so the pass is O(K x M) — the analogue of
the reference iterating its few ``SweptCcd`` entities, instead of round 1's
O(M^2) all-pairs sweep.

Sweep modes (``SweepMode::{Linear, NonLinear}``, ``ccd/mod.rs:479-498``):
linear ignores rotation during the sweep; nonlinear (per-body
``swept_ccd_nonlinear``) interpolates the body's accumulated rotation along
the sweep and widens the conservative step by the angular travel bound
(``cast_shapes_nonlinear`` semantics, ``ccd/mod.rs:692-780``).
"""

import jax
import jax.numpy as jnp

from avian_tpu.core.config import PhysicsConfig
from avian_tpu.core.state import World
from avian_tpu.geometry.narrowphase import compute_manifold
from avian_tpu.math import quat as quat_m
from avian_tpu.math import vec
from avian_tpu.pipeline.solver_body import SolverState

_ITERS = 8
_TOI_EPS = 1.0001  # advance slightly past the TOI (ccd/mod.rs:644-683)


def solve_swept_ccd(world: World, s: SolverState, config: PhysicsConfig) -> SolverState:
    """Rewind delta positions of swept-CCD bodies to their earliest TOI."""
    col = world.colliders
    b = world.bodies
    m = col.capacity
    k_cap = min(config.max_swept_colliders, m)

    pos0 = b.pos[col.body_idx] + quat_m.rotate(
        b.quat[col.body_idx], col.local_pos
    )
    quat0 = quat_m.mul(b.quat[col.body_idx], col.local_quat)
    sweep = s.delta_pos[col.body_idx]  # linear sweep of each collider

    # Accumulated rotation of each collider's body over the step, as a
    # scaled axis (for the nonlinear sweep mode).
    dq = s.delta_quat[col.body_idx]
    rot_axis_angle = quat_m.to_scaled_axis(dq)
    nonlinear = b.swept_ccd_nonlinear[col.body_idx]
    rot_axis_angle = jnp.where(nonlinear[:, None], rot_axis_angle, 0.0)
    # Angular travel bound: rotation angle x bounding radius.
    radius = 0.5 * jnp.linalg.norm(col.aabb_max - col.aabb_min, axis=-1)
    ang_travel = jnp.linalg.norm(rot_axis_angle, axis=-1) * radius

    flagged = (
        b.swept_ccd[col.body_idx]
        & b.active[col.body_idx]
        & col.active
        & (vec.length_sq(sweep) > 1e-12)
    )

    # Gather up to K flagged colliders (deterministic: lowest indices win).
    score = jnp.where(flagged, -jnp.arange(m, dtype=jnp.float32), -jnp.inf)
    _, swept_idx = jax.lax.top_k(score, k_cap)
    swept_ok = flagged[swept_idx]

    layers_ok = (
        (col.layer_members[swept_idx][:, None] & col.layer_filter[None, :]) > 0
    ) & ((col.layer_members[None, :] & col.layer_filter[swept_idx][:, None]) > 0)

    pairs = (
        config.shape_pairs
        if config.shape_pairs is not None
        else world.shape_pairs
    )

    def toi_one(row, i):
        """Earliest TOI in [0, 1] of swept collider i against all others.

        The sweep is evaluated in *relative* motion: collider j advances
        along its own delta position (and, in nonlinear mode, its own
        accumulated rotation) during the sweep, so two swept bodies fired
        at each other see each other (``ccd/mod.rs:523-687`` sweeps
        CCD-vs-CCD pairs too), and a fast bullet chasing a moving target
        gets the correct closing speed.
        """
        aa_i = rot_axis_angle[i]

        def vs_other(j):
            d_rel = sweep[i] - sweep[j]
            dist = vec.length(d_rel)
            dirn = vec.normalize_or(d_rel, jnp.asarray([1.0, 0.0, 0.0]))
            ang = ang_travel[i] + ang_travel[j]
            aa_j = rot_axis_angle[j]

            def body_fn(k, state):
                t, done, sep0 = state
                q_i = quat_m.mul(quat_m.from_scaled_axis(aa_i * t), quat0[i])
                q_j = quat_m.mul(quat_m.from_scaled_axis(aa_j * t), quat0[j])
                mf = compute_manifold(
                    col.shape_type[i], pos0[i] + sweep[i] * t, q_i,
                    col.params[i],
                    col.shape_type[j], pos0[j] + sweep[j] * t, q_j,
                    col.params[j],
                    shape_pairs=pairs,
                    convex_verts=world.convex_verts,
                )
                sep = jnp.min(mf.separation)
                sep0 = jnp.where(k == 0, sep, sep0)  # separation at t=0
                # Conservative approach bound: relative closing speed along
                # the normal plus both bodies' angular surface travel per
                # unit t (normal points i -> j, so closing means positive).
                approach = jnp.dot(dirn, mf.normal) * dist + ang
                hit = sep < 1e-4
                step = jnp.where(
                    approach > 1e-6, sep / jnp.maximum(approach, 1e-6), 2.0
                )
                new_t = jnp.where(done | hit, t, t + jnp.maximum(step, 0.0))
                return jnp.minimum(new_t, 1.5), done | hit, sep0

            t, hit, sep0 = jax.lax.fori_loop(
                0, _ITERS, body_fn,
                (jnp.asarray(0.0), jnp.asarray(False), jnp.asarray(jnp.inf)),
            )
            valid = (
                (j != i)
                & col.active[j]
                & (col.body_idx[j] != col.body_idx[i])
                # Pairs already touching at step start are the contact
                # solver's job (speculative margins); rewinding them would
                # freeze resting swept bodies in place.
                & (sep0 > 1e-4)
                & layers_ok[row, j]
            )
            return jnp.where(valid & hit, t, 1.0)

        return jnp.min(jax.vmap(vs_other)(jnp.arange(m)))

    tois_k = jax.vmap(toi_one)(jnp.arange(k_cap), swept_idx)
    tois_k = jnp.where(swept_ok, tois_k, 1.0)

    # Min TOI per body over its swept colliders.
    body_toi = jnp.ones((b.capacity,), jnp.float32).at[
        col.body_idx[swept_idx]
    ].min(tois_k)
    scale = jnp.minimum(body_toi * _TOI_EPS, 1.0)
    return s.replace(delta_pos=s.delta_pos * scale[:, None])
