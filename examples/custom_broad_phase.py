"""Custom broadphase (reference `custom_broad_phase.rs`, `lib.rs:674-736`:
every plugin is replaceable): compose your own physics step from the
public stage functions, swapping the grid broadphase for a user-written
brute-force O(M^2) one — every downstream stage consumes it unchanged.

This is the TPU-native replaceability story: the step is a pure function
pipeline (SURVEY.md §3.1), so "replacing a plugin" = calling your own
stage function between the others.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.pipeline import broadphase as bp_m
from avian_tpu.pipeline import contacts as np_m
from avian_tpu.pipeline import integrator as int_m
from avian_tpu.pipeline import sleeping as sleep_m
from avian_tpu.pipeline import solver as sol_m
from avian_tpu.pipeline import solver_body as sb_m
from avian_tpu.pipeline.broadphase import BroadPhaseResult, _pair_filters


def brute_force_broad_phase(world, config) -> BroadPhaseResult:
    """All-pairs AABB broadphase: the simplest possible replacement.
    Emits the same BroadPhaseResult contract the narrowphase consumes."""
    col = world.colliders
    m = col.capacity
    c_cap = world.contacts.capacity
    ii, jj = jnp.triu_indices(m, k=1)
    overlap = jnp.all(
        (col.aabb_min[ii] <= col.aabb_max[jj])
        & (col.aabb_min[jj] <= col.aabb_max[ii]),
        axis=-1,
    )
    ok = overlap & _pair_filters(world, ii, jj)
    # Deterministic compaction into the fixed pair buffer.
    slot_end = jnp.cumsum(ok.astype(jnp.int32))
    total = slot_end[-1]
    slot = jnp.where(ok, slot_end - 1, c_cap)
    a = jnp.zeros((c_cap,), jnp.int32).at[slot].set(
        ii.astype(jnp.int32), mode="drop"
    )
    b = jnp.zeros((c_cap,), jnp.int32).at[slot].set(
        jj.astype(jnp.int32), mode="drop"
    )
    key = jnp.full((c_cap,), -1, jnp.int32).at[slot].set(
        (ii * m + jj).astype(jnp.int32), mode="drop"
    )
    num = jnp.minimum(total, c_cap)
    return BroadPhaseResult(
        collider_a=a, collider_b=b, pair_key=key,
        valid=jnp.arange(c_cap) < num, num_pairs=num,
        dropped=total - num,
    )


@partial(jax.jit, static_argnames=("config",))
def custom_step(world, config):
    """physics_step with the broadphase swapped out."""
    h = config.substep_dt
    world = bp_m.update_aabbs(world, config)
    bp = brute_force_broad_phase(world, config)          # <- the swap
    contacts = np_m.narrow_phase(world, bp, config)
    s = sb_m.prepare(world.bodies)
    inc = int_m.pre_process_velocity_increments(world.bodies, world.gravity, h)
    con = sol_m.prepare_constraints(world, contacts, s, config)

    def substep(carry, _):
        s, con = carry
        s = int_m.integrate_velocities(s, inc, world.bodies, h)
        s = int_m.clamp_velocities(s, world.bodies)
        s = sol_m.warm_start(s, con, config)
        s, con = sol_m.solve_pass(s, con, h, True, config)
        s = int_m.integrate_positions(s, h)
        s, con = sol_m.solve_pass(s, con, h, False, config)
        return (s, con), None

    (s, con), _ = jax.lax.scan(substep, (s, con), None, length=config.substeps)
    s, con = sol_m.solve_restitution(s, con, config)
    contacts = sol_m.store_impulses(contacts, con)
    bodies = sb_m.writeback(world.bodies, s)
    bodies = sleep_m.update_sleeping(bodies, contacts, world.joints, config)
    return world.replace(
        bodies=bodies, contacts=contacts, time=world.time + config.dt
    )


def main():
    from avian_tpu.pipeline.step import physics_step

    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    for i in range(8):
        body = b.add_body(pos=(0.1 * i, 0.5 + 1.001 * i, 0))
        b.box(body, 0.5, 0.5, 0.5, friction=0.6)
    world = b.finalize(max_bodies=16, max_colliders=16, max_contacts=128)
    config = PhysicsConfig(max_colors=4)

    w_custom = world
    w_std = world
    for _ in range(120):
        w_custom = custom_step(w_custom, config)
        w_std = physics_step(w_std, config)

    pc = np.asarray(w_custom.bodies.pos)
    ps = np.asarray(w_std.bodies.pos)
    assert np.isfinite(pc).all()
    # The custom broadphase finds the same pairs, but emits them in a
    # different buffer order (triu vs grid-cell order), so constraint
    # coloring/solve order differs -> tiny numeric divergence. Both runs
    # must still settle into the same stack.
    np.testing.assert_allclose(pc, ps, atol=2e-2)
    print("custom broadphase: stack matches the stock grid broadphase "
          f"(max drift {np.abs(pc - ps).max():.1e})")


if __name__ == "__main__":
    main()
