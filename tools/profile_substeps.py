"""Substep-loop structure experiments on the real device (10k pile).

profile_stages.py round-5 finding: the whole 12-color restitution scan in
`finalize` costs <1 ms, but the SAME color rounds inside the nested
substep scan cost ~95 ms/step — the per-round work is cheap, the nesting
is not. This tool times full-step variants (forced-D2H slope) that change
only the substep-loop STRUCTURE, to find which nesting artifact owns it:

  base          - production physics_step (scan substeps x scan colors)
  data_hoist    - con.data (invariant 28 MB table) closed over, NOT carried
                  through the substep scan
  unroll_sub    - substeps as a Python loop (colors still lax.scan)
  unroll_col    - colors as a Python loop (substeps still lax.scan)
  unroll_both   - both loops unrolled
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
from avian_tpu.pipeline import solver as sol_m
from avian_tpu.pipeline import solver_body as sb_m
from avian_tpu.pipeline.step import physics_step
from avian_tpu.scenes import cube_pile

N = int(os.environ.get("BENCH_CUBES", "10000"))
K1 = int(os.environ.get("PROF_K1", "4"))
K2 = int(os.environ.get("PROF_K2", "16"))

config = PhysicsConfig(
    substeps=4,
    shape_pairs=(
        (ShapeType.BOX, ShapeType.BOX),
        (ShapeType.BOX, ShapeType.PLANE),
    ),
)
h = config.substep_dt


def solve_pass_variant(s, con, use_bias, scan_colors, data_in_carry):
    state = jnp.concatenate(
        [s.lin_vel, s.ang_vel, s.delta_pos, s.delta_quat], axis=-1
    )
    mos = config.solver.max_overlap_solve_speed
    st2 = (
        config.solver.static_friction_speed_threshold * config.length_unit
    ) ** 2

    if scan_colors:
        if data_in_carry:
            def body(st, x):
                d, irows, a, b, rlx = x
                st, new_d = sol_m._solve_bucket(
                    st, d, irows, a, b, rlx, h, use_bias, mos, st2
                )
                return st, new_d
            state, imp = jax.lax.scan(
                body, state,
                (con.data, con.imp, con.bucket_a, con.bucket_b, con.relax),
            )
        else:
            data = con.data  # closed over: scan carries/xs exclude it

            def body(st, x):
                ci, irows, a, b, rlx = x
                st, new_d = sol_m._solve_bucket(
                    st, data[ci], irows, a, b, rlx, h, use_bias, mos, st2
                )
                return st, new_d
            state, imp = jax.lax.scan(
                body, state,
                (jnp.arange(con.data.shape[0]), con.imp, con.bucket_a,
                 con.bucket_b, con.relax),
            )
    else:
        imps = []
        for ci in range(con.data.shape[0]):
            state, new_d = sol_m._solve_bucket(
                state, con.data[ci], con.imp[ci], con.bucket_a[ci],
                con.bucket_b[ci], con.relax[ci], h, use_bias, mos, st2,
            )
            imps.append(new_d)
        imp = jnp.stack(imps)
    return (
        s.replace(lin_vel=state[:, 0:3], ang_vel=state[:, 3:6]),
        con.replace(imp=imp),
    )


def step_variant(world, scan_sub, scan_colors, data_in_carry):
    world = bp_m.update_aabbs(world, config, ())
    bp = bp_m.broad_phase(world, config)
    contacts = np_m.narrow_phase(world, bp, config, ())
    s = sb_m.prepare(world.bodies)
    inc = int_m.pre_process_velocity_increments(
        world.bodies, world.gravity, h
    )
    con = sol_m.prepare_constraints(world, contacts, s, config)

    def substep(carry, _):
        s, con = carry
        s = int_m.integrate_velocities(s, inc, world.bodies, h)
        s = int_m.clamp_velocities(s, world.bodies)
        s = sol_m.warm_start(s, con, config)
        s, con = solve_pass_variant(s, con, True, scan_colors, data_in_carry)
        s = int_m.integrate_positions(s, h)
        s, con = solve_pass_variant(s, con, False, scan_colors, data_in_carry)
        return (s, con), None

    if scan_sub:
        (s, con), _ = jax.lax.scan(
            substep, (s, con), None, length=config.substeps
        )
    else:
        carry = (s, con)
        for _ in range(config.substeps):
            carry, _ = substep(carry, None)
        s, con = carry
    s, con = sol_m.solve_restitution(s, con, config)
    contacts = sol_m.store_impulses(contacts, con)
    bodies = sb_m.writeback(world.bodies, s)
    return world.replace(
        bodies=bodies, contacts=contacts, time=world.time + config.dt
    )


def forced(fn, w):
    t0 = time.perf_counter()
    out = fn(w)
    _ = float(out.bodies.pos[0, 0])
    return time.perf_counter() - t0


def main():
    world, _ = cube_pile(n_cubes=N, max_contacts=8 * N)
    step = jax.jit(lambda w: physics_step(w, config))
    world = step(world)
    jax.block_until_ready(world.bodies.pos)
    for _ in range(60):
        world = step(world)
    _ = float(world.bodies.pos[0, 0])
    print(f"device={jax.devices()[0]} N={N} K1={K1} K2={K2}", flush=True)

    VARIANTS = [
        ("base", True, True, True),
        ("data_hoist", True, True, False),
        ("unroll_sub", False, True, True),
        ("unroll_col", True, False, True),
        ("unroll_both", False, False, True),
    ]
    for name, scan_sub, scan_colors, data_in_carry in VARIANTS:
        def make(k):
            @jax.jit
            def many(w):
                def body(w_, _):
                    return step_variant(
                        w_, scan_sub, scan_colors, data_in_carry
                    ), None
                return jax.lax.scan(body, w, None, length=k)[0]
            return many

        f1, f2 = make(K1), make(K2)
        forced(f1, world)
        forced(f2, world)
        t1, t2 = forced(f1, world), forced(f2, world)
        ms = (t2 - t1) / (K2 - K1) * 1e3
        print(f"{name:>12}: {ms:8.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
