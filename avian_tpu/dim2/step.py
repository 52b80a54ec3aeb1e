"""One 2D physics step: jittable ``physics_step_2d(world, config) -> world``.

Same staging as the 3D ``pipeline/step.py`` (and the reference's
``PhysicsSchedule``/``SubstepSchedule``, SURVEY.md §3.1), on the dedicated
2D profile. Supports the same ``hooks`` and ``custom_joints`` extension
points.
"""

from functools import partial

import jax
import jax.numpy as jnp

from avian_tpu.core import types
from avian_tpu.core.config import PhysicsConfig
from avian_tpu.dim2 import broadphase as bp_m
from avian_tpu.dim2 import contacts as np_m
from avian_tpu.dim2 import dynamics as dyn_m
from avian_tpu.dim2 import solver as sol_m
from avian_tpu.dim2 import xpbd as xpbd_m
from avian_tpu.dim2.state import World2D
from avian_tpu.pipeline.sleeping import compute_islands


@partial(
    jax.jit,
    static_argnames=("config", "return_diagnostics", "hooks", "custom_joints"),
)
def physics_step_2d(
    world: World2D,
    config: PhysicsConfig,
    return_diagnostics: bool = False,
    hooks=None,
    custom_joints=None,
):
    h = config.substep_dt

    # ---- collision detection -------------------------------------------
    world = bp_m.update_aabbs(world, config)
    bp = bp_m.broad_phase(world, config)
    if hooks is not None and hasattr(hooks, "filter_pairs"):
        valid = hooks.filter_pairs(world, bp.collider_a, bp.collider_b, bp.valid)
        bp = bp.__class__(
            collider_a=bp.collider_a,
            collider_b=bp.collider_b,
            pair_key=jnp.where(valid, bp.pair_key, -1),
            valid=valid,
            num_pairs=jnp.sum(valid.astype(jnp.int32)),
            dropped=bp.dropped,
        )
    contacts = np_m.narrow_phase(world, bp, config)
    if hooks is not None and hasattr(hooks, "modify_contacts"):
        contacts = hooks.modify_contacts(world, contacts)

    # ---- prepare ---------------------------------------------------------
    s = dyn_m.prepare(world.bodies)
    inc = dyn_m.pre_process_velocity_increments(world.bodies, world.gravity, h)
    con = sol_m.prepare_constraints(world, contacts, s, config)
    has_joints = world.joints.capacity > 0
    jcon = xpbd_m.prepare_joints(world, s, config) if has_joints else None
    cdata = (
        custom_joints.prepare(world, s, config)
        if custom_joints is not None
        else None
    )

    # ---- substep loop ----------------------------------------------------
    def substep(carry, _):
        s, con, jcon, cdata = carry
        s = dyn_m.integrate_velocities(s, inc, world.bodies)
        s = dyn_m.clamp_velocities(s, world.bodies)
        s = sol_m.warm_start(s, con, config)
        s, con = sol_m.solve_pass(s, con, h, True, config)
        s = dyn_m.integrate_positions(s, h)
        s, con = sol_m.solve_pass(s, con, h, False, config)
        if jcon is not None or custom_joints is not None:
            s, jcon, cdata = xpbd_m.solve_position_constraints(
                s, jcon, world.bodies, h, config, custom_joints, cdata
            )
        return (s, con, jcon, cdata), None

    (s, con, jcon, cdata), _ = jax.lax.scan(
        substep, (s, con, jcon, cdata), None, length=config.substeps
    )

    # ---- swept CCD (after substeps, before restitution; ccd/mod.rs:257) --
    if config.swept_ccd:
        from avian_tpu.dim2 import ccd as ccd_m

        s = ccd_m.solve_swept_ccd_2d(world, s, config)

    # ---- finalize --------------------------------------------------------
    s, con = sol_m.solve_restitution(s, con, config)
    contacts = sol_m.store_impulses(contacts, con)
    joints = (
        xpbd_m.store_joint_forces(world.joints, jcon, config)
        if has_joints
        else world.joints
    )
    bodies = dyn_m.writeback(world.bodies, s)

    bodies = bodies.replace(
        force=jnp.zeros_like(bodies.force),
        torque=jnp.zeros_like(bodies.torque),
    )

    bodies = _update_sleeping(bodies, contacts, joints, config)

    new_world = world.replace(
        bodies=bodies,
        contacts=contacts,
        joints=joints,
        time=world.time + config.dt,
    )

    # ---- NaN quarantine --------------------------------------------------
    nonfinite_bodies = jnp.zeros((), jnp.int32)
    if config.nan_guard:
        bad = ~(
            jnp.all(jnp.isfinite(bodies.pos), axis=-1)
            & jnp.isfinite(bodies.angle)
            & jnp.all(jnp.isfinite(bodies.lin_vel), axis=-1)
            & jnp.isfinite(bodies.ang_vel)
        ) & bodies.active
        nonfinite_bodies = jnp.sum(bad.astype(jnp.int32))
        ok = nonfinite_bodies == 0
        frozen = world.replace(
            time=world.time + config.dt, diverged=jnp.asarray(True)
        )
        new_world = jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), new_world, frozen
        )

    if return_diagnostics:
        diagnostics = {
            "num_pairs": bp.num_pairs,
            "dropped_pairs": bp.dropped,
            "overflow_dropped": con.overflow_dropped,
            "num_overflow": con.num_overflow,
            "num_touching": jnp.sum(contacts.touching.astype(jnp.int32)),
            "num_sleeping": jnp.sum(bodies.sleeping.astype(jnp.int32)),
            "nonfinite_bodies": nonfinite_bodies,
            "diverged": new_world.diverged,
            "max_penetration": jnp.max(
                jnp.where(
                    contacts.touching[:, None]
                    & (
                        jnp.arange(contacts.penetration.shape[1])[None, :]
                        < contacts.num_points[:, None]
                    ),
                    contacts.penetration,
                    0.0,
                )
            ),
        }
        return new_world, diagnostics
    return new_world


def _update_sleeping(bodies, contacts, joints, config: PhysicsConfig):
    """2D sleeping: reuses the dimension-agnostic island computation
    (``pipeline/sleeping.py``) with scalar angular velocity."""
    if not config.sleeping_enabled:
        island, _ = compute_islands(bodies, contacts, joints)
        return bodies.replace(island=island)

    n = bodies.capacity
    lin_t = config.sleep_linear_threshold * config.length_unit
    ang_t = config.sleep_angular_threshold

    below = (
        (jnp.sum(bodies.lin_vel**2, axis=-1) < lin_t * lin_t)
        & (bodies.ang_vel**2 < ang_t * ang_t)
        & ~bodies.sleep_disabled
    )
    timer = jnp.where(below, bodies.sleep_timer + config.dt, 0.0)

    island, overflow = compute_islands(bodies, contacts, joints)
    ready = (timer >= config.time_to_sleep) & ~overflow
    considered = bodies.active & (bodies.body_type != types.BodyType.STATIC)
    all_ready = jnp.ones((n,), bool).at[island].min(
        jnp.where(considered, ready, True)
    )
    sleep = considered & all_ready[island] & (
        bodies.body_type == types.BodyType.DYNAMIC
    )
    woke = bodies.sleeping & ~sleep
    timer = jnp.where(woke, 0.0, timer)

    return bodies.replace(
        sleeping=sleep,
        sleep_timer=timer,
        island=island,
        lin_vel=jnp.where(sleep[:, None], 0.0, bodies.lin_vel),
        ang_vel=jnp.where(sleep, 0.0, bodies.ang_vel),
    )


def rollout_2d(world: World2D, config: PhysicsConfig, num_steps: int):
    def body(w, _):
        return physics_step_2d(w, config), None

    final, _ = jax.lax.scan(body, world, None, length=num_steps)
    return final
