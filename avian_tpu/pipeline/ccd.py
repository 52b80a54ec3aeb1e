"""Swept CCD: conservative-advancement time-of-impact rewind.

Counterpart of the reference's opt-in ``SweptCcd``
(``src/dynamics/ccd/mod.rs:389-419,523-687``): after the substep loop,
bodies flagged for swept CCD compute the earliest time of impact along their
accumulated delta position against every other collider, and their delta
position is rewound to ``TOI * (1 + epsilon)`` so the next step's speculative
contacts resolve the impact instead of tunneling.

Speculative contacts (the default CCD, ``NarrowPhaseConfig`` speculative
margins) are handled in the narrowphase; this pass is only for the opt-in
sweep. It is gated behind ``PhysicsConfig.swept_ccd`` because it is an
O(M_flagged x M) computation.

The TOI oracle is conservative advancement over the analytic manifold
distance (the same primitive the shape caster uses), with linear sweeps
(``SweepMode::Linear``): rotation during the sweep is ignored, like the
reference's linear mode.
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

    pos0 = b.pos[col.body_idx] + quat_m.rotate(
        b.quat[col.body_idx], col.local_pos
    )
    quat0 = quat_m.mul(b.quat[col.body_idx], col.local_quat)
    sweep = s.delta_pos[col.body_idx]  # linear sweep of each collider

    flagged = (
        b.swept_ccd[col.body_idx]
        & b.active[col.body_idx]
        & col.active
        & (vec.length_sq(sweep) > 1e-12)
    )

    layers_ok = (
        (col.layer_members[:, None] & col.layer_filter[None, :]) > 0
    ) & ((col.layer_members[None, :] & col.layer_filter[:, None]) > 0)

    def toi_one(i):
        """Earliest TOI in [0, 1] of collider i against all others."""
        d = sweep[i]
        dist = vec.length(d)
        dirn = vec.normalize_or(d, jnp.asarray([1.0, 0.0, 0.0]))

        def vs_other(j):
            def body_fn(_, state):
                t, done = state
                mf = compute_manifold(
                    col.shape_type[i], pos0[i] + d * t, quat0[i],
                    col.params[i],
                    col.shape_type[j], pos0[j], quat0[j], col.params[j],
                    shape_pairs=(
                        config.shape_pairs
                        if config.shape_pairs is not None
                        else world.shape_pairs
                    ),
                )
                sep = jnp.min(mf.separation)
                approach = jnp.dot(dirn, mf.normal) * dist
                hit = sep < 1e-4
                step = jnp.where(
                    approach > 1e-6, sep / jnp.maximum(approach, 1e-6), 2.0
                )
                new_t = jnp.where(done | hit, t, t + jnp.maximum(step, 0.0))
                return jnp.minimum(new_t, 1.5), done | hit

            t, hit = jax.lax.fori_loop(
                0, _ITERS, body_fn, (jnp.asarray(0.0), jnp.asarray(False))
            )
            valid = (
                (j != i)
                & col.active[j]
                & (col.body_idx[j] != col.body_idx[i])
                & ~b.swept_ccd[col.body_idx[j]]  # sweep vs non-swept only
                & layers_ok[i, j]
            )
            return jnp.where(valid & hit, t, 1.0)

        tois = jax.vmap(vs_other)(jnp.arange(m))
        return jnp.min(tois)

    tois = jax.vmap(toi_one)(jnp.arange(m))
    tois = jnp.where(flagged, tois, 1.0)

    # Min TOI per body over its colliders.
    body_toi = jnp.ones((b.capacity,), jnp.float32).at[col.body_idx].min(
        tois
    )
    scale = jnp.minimum(body_toi * _TOI_EPS, 1.0)
    return s.replace(delta_pos=s.delta_pos * scale[:, None])
