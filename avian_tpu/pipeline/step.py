"""One physics step: the jittable ``step(world, config) -> world``.

Staged exactly like the reference's ``PhysicsSchedule``/``SubstepSchedule``
(SURVEY.md §3.1):

broadphase -> narrowphase -> prepare (solver bodies, velocity increments,
contact constraints, coloring) -> ``lax.scan`` over substeps
[integrate velocities -> warm start -> biased solve -> integrate positions ->
relax solve -> XPBD joints -> joint damping] -> restitution -> writeback ->
store impulses -> sleeping.

Batch thousands of scenes with ``jax.vmap(physics_step, in_axes=(0, None))``
and shard over a TPU mesh with ``avian_tpu.parallel``.
"""

from functools import partial

import jax
import jax.numpy as jnp

from avian_tpu.core import types
from avian_tpu.core.config import PhysicsConfig
from avian_tpu.core.state import World
from avian_tpu.pipeline import broadphase as bp_m
from avian_tpu.pipeline import contacts as np_m
from avian_tpu.pipeline import integrator as int_m
from avian_tpu.pipeline import sleeping as sleep_m
from avian_tpu.pipeline import solver as sol_m
from avian_tpu.pipeline import solver_body as sb_m
from avian_tpu.pipeline import xpbd as xpbd_m


@partial(
    jax.jit,
    static_argnames=(
        "config", "return_diagnostics", "hooks", "custom_joints",
        "custom_shapes",
    ),
)
def physics_step(
    world: World,
    config: PhysicsConfig,
    return_diagnostics: bool = False,
    hooks=None,
    custom_joints=None,
    custom_shapes=(),
):
    """Advance the world by ``config.dt`` seconds.

    ``hooks`` is the TPU-native counterpart of the reference's
    ``CollisionHooks`` trait (``src/collision/hooks.rs:8``): an object with
    optional methods
    ``filter_pairs(world, collider_a, collider_b, valid) -> valid`` (called
    with the broadphase candidate arrays, like the reference's broadphase
    hook ``broad_phase.rs:430-439``) and
    ``modify_contacts(world, contacts) -> contacts`` (called after the
    narrowphase, ``system_param.rs:771-778``) — e.g. one-way platforms zero
    out manifolds, conveyor belts inject surface velocity. Must be a static
    (hashable) object; changing it recompiles.

    ``custom_joints`` is the user-constraint extension point — the
    counterpart of implementing the reference's ``XpbdConstraint`` trait
    (``src/dynamics/solver/xpbd/mod.rs:23-52``) and registering it in
    ``XpbdSolverSystems::SolveUserConstraints`` (``custom_constraint.rs``).
    A static (hashable) object with
    ``prepare(world, s, config) -> data`` (called once per step, like
    ``XpbdConstraint::prepare``) and ``solve(s, data, h) -> (s, data)``
    (called every substep inside the position-solve window, before the
    shared velocity projection). See ``avian_tpu.api.custom`` for the
    correction helpers mirroring ``PositionConstraint``/
    ``AngularConstraint``.

    ``custom_shapes`` is the user-collider extension point — the
    counterpart of the reference's ``AnyCollider`` implementation plus
    ``ColliderBackendPlugin``/``NarrowPhasePlugin`` registration
    (``custom_collider.rs``): a static tuple of
    :class:`avian_tpu.CustomShape` whose index matches the codes stored by
    ``SceneBuilder.custom_collider``.
    """
    h = config.substep_dt
    # Scenes built via SceneBuilder.custom_collider(shape=...) carry their
    # CustomShapes as World static metadata; an explicit argument wins.
    custom_shapes = custom_shapes if custom_shapes else world.custom_shapes

    def _core(world):
        """The full step. Returns (new_world, (num_pairs, dropped,
        overflow_dropped, num_overflow, num_points)) so the all-asleep
        early-out branch can mirror the structure."""
        # ---- collision detection -----------------------------------------
        world2 = bp_m.update_aabbs(world, config, custom_shapes)
        bp = bp_m.broad_phase(world2, config)
        if hooks is not None and hasattr(hooks, "filter_pairs"):
            valid = hooks.filter_pairs(
                world2, bp.collider_a, bp.collider_b, bp.valid
            )
            bp = bp.__class__(
                collider_a=bp.collider_a,
                collider_b=bp.collider_b,
                pair_key=jnp.where(valid, bp.pair_key, -1),
                valid=valid,
                num_pairs=jnp.sum(valid.astype(jnp.int32)),
                dropped=bp.dropped,
            )
        contacts = np_m.narrow_phase(world2, bp, config, custom_shapes)
        if hooks is not None and hasattr(hooks, "modify_contacts"):
            contacts = hooks.modify_contacts(world2, contacts)

        # ---- prepare ------------------------------------------------------
        s = sb_m.prepare(world2.bodies)
        inc = int_m.pre_process_velocity_increments(
            world2.bodies, world2.gravity, h
        )
        con = sol_m.prepare_constraints(world2, contacts, s, config)
        has_joints = world2.joints.capacity > 0  # static
        jcon = (
            xpbd_m.prepare_joints(world2, s, config) if has_joints else None
        )
        cdata = (
            custom_joints.prepare(world2, s, config)
            if custom_joints is not None
            else None
        )

        # ---- substep loop (lax.scan: one traced substep, compiled once —
        # measured faster than unrolling on this runtime) --------------------
        def substep(carry, _):
            s, con, jcon, cdata = carry
            s = int_m.integrate_velocities(s, inc, world2.bodies, h)
            s = int_m.clamp_velocities(s, world2.bodies)
            s = sol_m.warm_start(s, con, config)
            s, con = sol_m.solve_pass(s, con, h, True, config)
            s = int_m.integrate_positions(s, h)
            s, con = sol_m.solve_pass(s, con, h, False, config)
            if jcon is not None or custom_joints is not None:
                s, jcon, cdata = xpbd_m.solve_position_constraints(
                    s, jcon, world2.bodies, h, config, custom_joints, cdata
                )
            return (s, con, jcon, cdata), None

        (s, con, jcon, cdata), _ = jax.lax.scan(
            substep, (s, con, jcon, cdata), None, length=config.substeps
        )

        # ---- finalize -------------------------------------------------------
        if config.swept_ccd:
            from avian_tpu.pipeline import ccd as ccd_m

            s = ccd_m.solve_swept_ccd(world2, s, config)
        s, con = sol_m.solve_restitution(s, con, config)
        contacts = sol_m.store_impulses(contacts, con)
        joints = (
            xpbd_m.store_joint_forces(world2.joints, jcon, config)
            if has_joints
            else world2.joints
        )
        bodies = sb_m.writeback(world2.bodies, s)

        # Clear per-step force/torque accumulators (Forces API semantics:
        # forces apply for one step, reference ``forces/plugin.rs:96-243``).
        z3 = jnp.zeros_like(bodies.force)
        bodies = bodies.replace(force=z3, torque=z3)

        bodies = sleep_m.update_sleeping(bodies, contacts, joints, config)

        new_world = world2.replace(
            bodies=bodies,
            contacts=contacts,
            joints=joints,
            time=world2.time + config.dt,
        )
        num_points = jnp.sum(
            jnp.where(contacts.touching, contacts.num_points, 0)
        )
        return new_world, (
            bp.num_pairs,
            bp.dropped,
            con.overflow_dropped,
            con.num_overflow,
            num_points,
        )

    def _skip(world):
        """All-asleep early-out: nothing can move, so skip detection and
        solving entirely (the reference pops sleeping islands' constraints
        and does no work for them, ``islands/sleeping.rs:355-426``; with
        EVERY island asleep the whole step is a no-op). Accumulators are
        still cleared (forces apply for one step; sleeping bodies ignore
        them) and time advances."""
        z3 = jnp.zeros_like(world.bodies.force)
        bodies = world.bodies.replace(force=z3, torque=z3)
        nw = world.replace(bodies=bodies, time=world.time + config.dt)
        z = jnp.zeros((), jnp.int32)
        return nw, (z, z, z, z, z)

    if config.sleeping_enabled and config.sleep_early_out:
        b0 = world.bodies
        dyn_awake = (
            b0.active
            & ~b0.sleeping
            & (b0.body_type == types.BodyType.DYNAMIC)
        )
        kin_moving = (
            b0.active
            & (b0.body_type == types.BodyType.KINEMATIC)
            & (
                jnp.any(b0.lin_vel != 0.0, axis=-1)
                | jnp.any(b0.ang_vel != 0.0, axis=-1)
            )
        )
        # A user teleport of a sleeping body (direct pytree write) must
        # take the full path so update_sleeping's wake logic sees it.
        teleported = b0.sleeping & (
            jnp.any(jnp.abs(b0.pos - b0.sleep_pos) > 1e-6, axis=-1)
            | jnp.any(jnp.abs(b0.quat - b0.sleep_quat) > 1e-6, axis=-1)
        )
        needs_step = jnp.any(dyn_awake | kin_moving | teleported)
        # Under jit (not vmap) TPU executes only the taken branch: a fully
        # asleep scene costs ~zero. Under vmap this lowers to a select
        # (both branches run) — batched scenes don't pay extra dispatches.
        new_world, (num_pairs, bp_dropped, overflow_dropped, num_overflow,
                    num_points) = jax.lax.cond(needs_step, _core, _skip,
                                               world)
    else:
        new_world, (num_pairs, bp_dropped, overflow_dropped, num_overflow,
                    num_points) = _core(world)
    bodies = new_world.bodies
    contacts = new_world.contacts

    # ---- NaN quarantine (SURVEY par.5; reference schedule/mod.rs:295-321) --
    # A diverged scene freezes in place (flagged) instead of propagating
    # NaNs; under vmap each scene quarantines independently.
    nonfinite_bodies = jnp.zeros((), jnp.int32)
    if config.nan_guard:
        bad_body = ~(
            jnp.all(jnp.isfinite(bodies.pos), axis=-1)
            & jnp.all(jnp.isfinite(bodies.quat), axis=-1)
            & jnp.all(jnp.isfinite(bodies.lin_vel), axis=-1)
            & jnp.all(jnp.isfinite(bodies.ang_vel), axis=-1)
        ) & bodies.active
        nonfinite_bodies = jnp.sum(bad_body.astype(jnp.int32))
        ok = nonfinite_bodies == 0
        frozen = world.replace(
            time=world.time + config.dt, diverged=jnp.asarray(True)
        )
        new_world = jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), new_world, frozen
        )

    if return_diagnostics:
        diagnostics = {
            "num_pairs": num_pairs,
            "dropped_pairs": bp_dropped,
            "overflow_dropped": overflow_dropped,
            "num_overflow": num_overflow,
            "num_touching": jnp.sum(contacts.touching.astype(jnp.int32)),
            "num_contact_points": num_points,
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


def rollout(world: World, config: PhysicsConfig, num_steps: int):
    """Run ``num_steps`` steps under one ``lax.scan`` (compiled once)."""

    def body(w, _):
        return physics_step(w, config), None

    final, _ = jax.lax.scan(body, world, None, length=num_steps)
    return final
