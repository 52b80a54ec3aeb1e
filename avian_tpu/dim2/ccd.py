"""2D swept CCD: conservative-advancement time-of-impact rewind.

The ``avian2d`` compile of the reference's opt-in ``SweptCcd``
(``src/dynamics/ccd/mod.rs:389-419,523-687``) on the [N,2] profile; same
design as the 3D ``pipeline/ccd.py``: after the substep loop, up to
``config.max_swept_colliders`` flagged colliders sweep their accumulated
delta position (in *relative* motion, so CCD-vs-CCD pairs see each other)
against every collider, and the owning body's delta position is rewound to
``min TOI * 1.0001`` so next step's speculative contacts resolve the
impact instead of tunneling.

Sweep modes (``SweepMode::{Linear, NonLinear}``): nonlinear interpolates
the body's accumulated rotation along the sweep and widens the
conservative step by the angular surface travel bound.
"""

import jax
import jax.numpy as jnp

from avian_tpu.core.config import PhysicsConfig
from avian_tpu.dim2.narrowphase import compute_manifold_2d, _normalize
from avian_tpu.dim2.state import World2D

_ITERS = 8
_TOI_EPS = 1.0001  # advance slightly past the TOI (ccd/mod.rs:644-683)


def solve_swept_ccd_2d(world: World2D, s, config: PhysicsConfig):
    """Rewind delta positions of swept-CCD bodies to their earliest TOI."""
    col = world.colliders
    b = world.bodies
    m = col.capacity
    k_cap = min(config.max_swept_colliders, m)

    c0 = jnp.cos(b.angle[col.body_idx])
    s0 = jnp.sin(b.angle[col.body_idx])
    pos0 = b.pos[col.body_idx] + jnp.stack(
        [
            c0 * col.local_pos[:, 0] - s0 * col.local_pos[:, 1],
            s0 * col.local_pos[:, 0] + c0 * col.local_pos[:, 1],
        ],
        axis=-1,
    )
    angle0 = b.angle[col.body_idx] + col.local_angle
    sweep = s.delta_pos[col.body_idx]

    # Accumulated body rotation over the step (nonlinear mode only).
    d_angle = s.delta_angle[col.body_idx]
    nonlinear = b.swept_ccd_nonlinear[col.body_idx]
    d_angle = jnp.where(nonlinear, d_angle, 0.0)
    radius = 0.5 * jnp.linalg.norm(col.aabb_max - col.aabb_min, axis=-1)
    ang_travel = jnp.abs(d_angle) * radius

    flagged = (
        b.swept_ccd[col.body_idx]
        & b.active[col.body_idx]
        & col.active
        & (jnp.sum(sweep * sweep, axis=-1) > 1e-12)
    )

    # Gather up to K flagged colliders (deterministic: lowest indices win).
    score = jnp.where(flagged, -jnp.arange(m, dtype=jnp.float32), -jnp.inf)
    _, swept_idx = jax.lax.top_k(score, k_cap)
    swept_ok = flagged[swept_idx]

    layers_ok = (
        (col.layer_members[swept_idx][:, None] & col.layer_filter[None, :]) > 0
    ) & ((col.layer_members[None, :] & col.layer_filter[swept_idx][:, None]) > 0)

    def toi_one(row, i):
        """Earliest TOI in [0, 1] of swept collider i against all others
        (relative motion: collider j advances along its own delta too)."""

        def vs_other(j):
            d_rel = sweep[i] - sweep[j]
            dist = jnp.linalg.norm(d_rel)
            dirn = jnp.where(
                dist > 1e-9, _normalize(d_rel), jnp.asarray([1.0, 0.0])
            )
            ang = ang_travel[i] + ang_travel[j]

            def body_fn(k, state):
                t, done, sep0 = state
                mf = compute_manifold_2d(
                    pos0[i] + sweep[i] * t, angle0[i] + d_angle[i] * t,
                    col.poly_verts[i], col.vert_count[i], col.radius[i],
                    col.is_plane[i],
                    pos0[j] + sweep[j] * t, angle0[j] + d_angle[j] * t,
                    col.poly_verts[j], col.vert_count[j], col.radius[j],
                    col.is_plane[j],
                )
                sep = jnp.min(mf.separation)
                sep0 = jnp.where(k == 0, sep, sep0)
                # Conservative approach bound: relative closing speed along
                # the normal (i -> j) plus angular surface travel per unit t.
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
                # Already-touching pairs are the contact solver's job.
                & (sep0 > 1e-4)
                & layers_ok[row, j]
            )
            return jnp.where(valid & hit, t, 1.0)

        return jnp.min(jax.vmap(vs_other)(jnp.arange(m)))

    tois_k = jax.vmap(toi_one)(jnp.arange(k_cap), swept_idx)
    tois_k = jnp.where(swept_ok, tois_k, 1.0)

    body_toi = jnp.ones((b.capacity,), jnp.float32).at[
        col.body_idx[swept_idx]
    ].min(tois_k)
    scale = jnp.minimum(body_toi * _TOI_EPS, 1.0)
    return s.replace(delta_pos=s.delta_pos * scale[:, None])
