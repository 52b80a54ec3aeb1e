"""Stage-level TPU profile of the flagship 10k-pile step.

Timing protocol (round-4, re-derived after discovering that
``jax.block_until_ready`` does NOT reliably block on the tunneled axon
runtime — enqueue-only timings undercount by orders of magnitude):

1. Every measurement is *forced* by a device->host read of a scalar that
   data-depends on the measured computation. Only a D2H proves the work
   ran.
2. The first D2H permanently degrades this runtime's dispatch path, so we
   enter degraded mode DELIBERATELY before any timing; after that every
   measurement carries the same constant per-dispatch overhead.
3. That constant (plus the D2H cost itself) is cancelled with the slope
   method: each prefix is timed at scan lengths K1 and K2 inside ONE jit
   dispatch each; per-step cost = (t(K2) - t(K1)) / (K2 - K1).
4. Scan iterations are chained through the state (the accumulated scalar
   is folded into body positions at 1e-38 scale), so XLA cannot hoist the
   pipeline stages out of the loop as loop-invariant.

Usage: python tools/profile_stages.py  [BENCH_CUBES=10000] [PROF_K1=8 PROF_K2=40]
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
K1 = int(os.environ.get("PROF_K1", "8"))
K2 = int(os.environ.get("PROF_K2", "40"))
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
    """Run the pipeline through stage index `upto`, returning `world`
    with a data-dependent scalar folded into body positions so that (a)
    no stage can be DCE'd and (b) consecutive scan iterations chain."""
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
    # Chain: fold acc into positions at a scale that cannot perturb
    # dynamics but creates a loop-carried data dependency.
    bodies = world.bodies.replace(
        pos=world.bodies.pos + acc * jnp.float32(1e-38)
    )
    return world.replace(
        bodies=bodies, time=world.time + 1.0 / 60.0
    )


def forced(fn, w):
    """Dispatch fn once and force completion via a scalar D2H."""
    t0 = time.perf_counter()
    out = fn(w)
    _ = float(out.bodies.pos[0, 0])  # scalar D2H: proves execution
    return time.perf_counter() - t0


def main():
    world, _ = cube_pile(n_cubes=N, max_contacts=8 * N)
    step = jax.jit(lambda w: physics_step(w, config))

    # settle the pile so we profile the contact-rich steady state
    world = step(world)
    jax.block_until_ready(world.bodies.pos)
    for _ in range(WARM):
        world = step(world)

    # Deliberately enter degraded-dispatch mode before ANY timing so all
    # measurements share the same per-dispatch constant (slope cancels it).
    _ = float(world.bodies.pos[0, 0])
    print(f"device={jax.devices()[0]} N={N} K1={K1} K2={K2} substeps=4",
          flush=True)

    def make(upto, k):
        @jax.jit
        def many(w):
            def body(w, _):
                return prefix_step(w, upto), None
            return jax.lax.scan(body, w, None, length=k)[0]
        return many

    rows = []
    for upto in range(len(STAGES)):
        f1, f2 = make(upto, K1), make(upto, K2)
        forced(f1, world)  # compile + one throwaway
        forced(f2, world)
        t1, t2 = forced(f1, world), forced(f2, world)
        ms = (t2 - t1) / (K2 - K1) * 1e3
        rows.append(ms)
        print(f"{STAGES[upto]:>12}: cum {ms:8.3f} ms/step   "
              f"(t{K1}={t1:6.3f}s t{K2}={t2:6.3f}s)", flush=True)

    @jax.jit
    def full1(w):
        return jax.lax.scan(
            lambda w, _: (physics_step(w, config), None), w, None, length=K1
        )[0]

    @jax.jit
    def full2(w):
        return jax.lax.scan(
            lambda w, _: (physics_step(w, config), None), w, None, length=K2
        )[0]

    forced(full1, world)
    forced(full2, world)
    t1, t2 = forced(full1, world), forced(full2, world)
    ms = (t2 - t1) / (K2 - K1) * 1e3
    print(f"{'FULL STEP':>12}: {ms:8.3f} ms/step   "
          f"(t{K1}={t1:6.3f}s t{K2}={t2:6.3f}s)")
    prev = 0.0
    for name, t in zip(STAGES, rows):
        print(f"{name:>12}: delta {t - prev:8.3f} ms")
        prev = t


if __name__ == "__main__":
    main()
