"""Stage-level TPU profile of the flagship 10k-pile step.

Times pipeline *prefixes* (each scanned K times inside one jit, so the
~1 ms/dispatch cost of this tunneled runtime amortizes away) and reports
per-stage deltas. No device->host transfer happens before or between
timed regions (axon dispatch-degradation pitfall); all readbacks are at
the end.

Usage: python tools/profile_stages.py  [BENCH_CUBES=10000] [PROF_REPS=30]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avian_tpu.utils.cache import enable as enable_cache

enable_cache()

import jax
import jax.numpy as jnp

from avian_tpu import PhysicsConfig
from avian_tpu.core.types import ShapeType
from avian_tpu.pipeline import broadphase as bp_m
from avian_tpu.pipeline import contacts as np_m
from avian_tpu.pipeline import integrator as int_m
from avian_tpu.pipeline import sleeping as sleep_m
from avian_tpu.pipeline import solver as sol_m
from avian_tpu.pipeline import solver_body as sb_m
from avian_tpu.pipeline.step import physics_step
from avian_tpu.scenes import cube_pile

N = int(os.environ.get("BENCH_CUBES", "10000"))
REPS = int(os.environ.get("PROF_REPS", "30"))
WARM = int(os.environ.get("BENCH_WARMUP", "60"))

config = PhysicsConfig(
    substeps=4,
    shape_pairs=(
        (ShapeType.BOX, ShapeType.BOX),
        (ShapeType.BOX, ShapeType.PLANE),
    ),
)
h = config.substep_dt

STAGES = [
    "aabbs", "broadphase", "narrowphase", "prepare", "substeps",
    "finalize",
]


def prefix_step(world, upto):
    """Run the pipeline through stage index `upto`; fold a data-dependent
    scalar into world.time so XLA cannot DCE the tail stage."""
    acc = jnp.zeros((), jnp.float32)
    w2 = bp_m.update_aabbs(world, config)
    acc += w2.colliders.aabb_min[:, 0].sum()
    if upto >= 1:
        bp = bp_m.broad_phase(w2, config)
        acc += bp.num_pairs.astype(jnp.float32)
    if upto >= 2:
        contacts = np_m.narrow_phase(w2, bp, config)
        acc += jnp.sum(contacts.penetration)
    if upto >= 3:
        s = sb_m.prepare(w2.bodies)
        inc = int_m.pre_process_velocity_increments(
            w2.bodies, w2.gravity, h
        )
        con = sol_m.prepare_constraints(w2, contacts, s, config)
        acc += con.num_overflow.astype(jnp.float32)
        acc += jnp.sum(s.delta_pos)
    if upto >= 4:
        def substep(carry, _):
            s, con = carry
            s = int_m.integrate_velocities(s, inc, w2.bodies, h)
            s = int_m.clamp_velocities(s, w2.bodies)
            s = sol_m.warm_start(s, con, config)
            s, con = sol_m.solve_pass(s, con, h, True, config)
            s = int_m.integrate_positions(s, h)
            s, con = sol_m.solve_pass(s, con, h, False, config)
            return (s, con), None

        (s, con), _ = jax.lax.scan(
            substep, (s, con), None, length=config.substeps
        )
        acc += jnp.sum(s.delta_pos)
    if upto >= 5:
        s, con = sol_m.solve_restitution(s, con, config)
        contacts2 = sol_m.store_impulses(contacts, con)
        bodies = sb_m.writeback(w2.bodies, s)
        bodies = sleep_m.update_sleeping(
            bodies, contacts2, w2.joints, config
        )
        acc += jnp.sum(bodies.pos)
    # keep acc alive without changing dynamics
    return world.replace(time=world.time + 1.0 / 60.0 + acc * 1e-38)


def main():
    world, _ = cube_pile(n_cubes=N, max_contacts=8 * N)
    step = jax.jit(lambda w: physics_step(w, config))

    # settle the pile so we profile the contact-rich steady state
    world = step(world)
    jax.block_until_ready(world.bodies.pos)
    for _ in range(WARM):
        world = step(world)
    jax.block_until_ready(world.bodies.pos)

    fns = []
    for upto in range(len(STAGES)):
        def make(upto):
            @jax.jit
            def many(w):
                def body(w, _):
                    return prefix_step(w, upto), None
                return jax.lax.scan(body, w, None, length=REPS)[0]
            return many
        fns.append(make(upto))

    # compile everything first (compile time must not pollute timing)
    for f in fns:
        jax.block_until_ready(f(world).bodies.pos)
    full = jax.jit(
        lambda w: jax.lax.scan(
            lambda w, _: (step(w), None), w, None, length=REPS
        )[0]
    )
    jax.block_until_ready(full(world).bodies.pos)

    times = []
    for f in fns:
        t0 = time.perf_counter()
        out = f(world)
        jax.block_until_ready(out.bodies.pos)
        times.append((time.perf_counter() - t0) / REPS * 1e3)
    t0 = time.perf_counter()
    out = full(world)
    jax.block_until_ready(out.bodies.pos)
    t_full = (time.perf_counter() - t0) / REPS * 1e3

    print(f"device={jax.devices()[0]} N={N} reps={REPS} substeps=4")
    prev = 0.0
    for name, t in zip(STAGES, times):
        print(f"{name:>12}: cum {t:7.3f} ms  delta {t - prev:7.3f} ms")
        prev = t
    print(f"{'FULL STEP':>12}: {t_full:7.3f} ms")


if __name__ == "__main__":
    main()
