"""Headline benchmark: body*steps/sec on a cube pile (BASELINE.md metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline anchor: the reference's illustrative Large Pyramid 2D number
(12.29 ms/step for 5050 boxes, 1 thread -> ~0.41M body*steps/sec,
/root/reference/benches/README.md:31-39). vs_baseline = ours / that.
"""

import json
import os
import sys
import time

import jax

N_CUBES = int(os.environ.get("BENCH_CUBES", "10000"))
N_STEPS = int(os.environ.get("BENCH_STEPS", "100"))
# BENCH_SCENE: "pile" (default, 3D cube pile) or "pyramid2d" (the
# reference's Large Pyramid 2D: base 100 -> 5050 boxes, 2D locked axes).
SCENE = os.environ.get("BENCH_SCENE", "pile")
PYRAMID_BASE = int(os.environ.get("BENCH_PYRAMID_BASE", "100"))
GRID = int(os.environ.get("BENCH_GRID", "10"))
BASELINE_BODY_STEPS_PER_SEC = 5050 / 12.29e-3  # ~410,903


def main():
    from avian_tpu.utils.cache import enable as enable_cache

    enable_cache()
    from avian_tpu import PhysicsConfig
    from avian_tpu.pipeline.step import physics_step, rollout
    from avian_tpu.scenes import cube_pile

    from avian_tpu.core.types import ShapeType

    # Reference bench protocol: 60 Hz, SubstepCount(4)
    # (/root/reference/benches/src/dim2/mod.rs:41-49).
    config = PhysicsConfig(
        substeps=4,
        shape_pairs=(
            (ShapeType.BOX, ShapeType.BOX),
            (ShapeType.BOX, ShapeType.PLANE),
        ),
    )
    if SCENE == "pyramid2d":
        from avian_tpu.scenes import box_pyramid

        world, ids = box_pyramid(base=PYRAMID_BASE)
        n_bodies = len(ids)
    elif SCENE == "many_pyramids":
        from avian_tpu.scenes import many_pyramids

        world, ids = many_pyramids(grid=GRID, base=10)  # 10x10 -> 5500 boxes
        n_bodies = len(ids)
    else:
        world, ids = cube_pile(n_cubes=N_CUBES, max_contacts=8 * N_CUBES)
        n_bodies = N_CUBES

    step = jax.jit(lambda w: physics_step(w, config))

    # Warm up: compile + let the pile make contact so we measure the
    # contact-rich steady state, not free fall. Run PAST the settling point
    # (the reference bench protocol also measures the settled pile).
    #
    # CRITICAL (axon runtime): NO device->host transfer may happen before or
    # during the timed region — a single D2H transfer permanently degrades
    # the runtime's dispatch path ~100x for every subsequent kernel launch
    # (measured: 0.4 ms/step before one float(world.time), 285 ms/step
    # after). All readbacks happen AFTER timing. block_until_ready is safe.
    world = step(world)
    jax.block_until_ready(world.bodies.pos)
    for _ in range(60):
        world = step(world)
    jax.block_until_ready(world.bodies.pos)

    t_before_dev = world.time  # device scalar; read back after timing
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        world = step(world)
    jax.block_until_ready(world.bodies.pos)
    elapsed = time.perf_counter() - t0

    # Sanity: the simulation must actually have advanced and stayed finite
    # (guards against degenerate executables from remote-compile flakes).
    import numpy as np

    t_delta = float(world.time - t_before_dev)  # first D2H transfer
    assert abs(t_delta - N_STEPS / 60.0) < 1e-3, (
        f"sim time did not advance correctly: delta {t_delta}"
    )
    assert bool(np.isfinite(np.asarray(world.bodies.pos)).all()), "NaN state"

    # Validate capacities: no silently dropped broadphase pairs and no
    # constraints dropped from the color buckets (cheap separate check —
    # detection + prepare only — to avoid recompiling the full step with
    # diagnostics).
    from avian_tpu.pipeline import broadphase as bp_m
    from avian_tpu.pipeline import contacts as np_m
    from avian_tpu.pipeline import solver as sol_m
    from avian_tpu.pipeline import solver_body as sb_m

    @jax.jit
    def check(w):
        w = bp_m.update_aabbs(w, config)
        bp = bp_m.broad_phase(w, config)
        contacts = np_m.narrow_phase(w, bp, config)
        con = sol_m.prepare_constraints(w, contacts, sb_m.prepare(w.bodies), config)
        return bp.dropped, con.overflow_dropped, con.num_overflow

    dropped, overflow_dropped, num_overflow = (int(x) for x in check(world))
    assert overflow_dropped == 0, (
        f"{overflow_dropped} constraints dropped from color buckets"
    )
    assert dropped == 0, f"{dropped} broadphase pairs dropped"

    steps_per_sec = N_STEPS / elapsed
    body_steps_per_sec = steps_per_sec * n_bodies
    print(
        json.dumps(
            {
                "metric": (
                    f"body_steps_per_sec_{SCENE}_{n_bodies}"
                    if SCENE != "pile"
                    else f"body_steps_per_sec_cube_pile_{N_CUBES}"
                ),
                "value": round(body_steps_per_sec),
                "unit": "body*steps/sec",
                "vs_baseline": round(
                    body_steps_per_sec / BASELINE_BODY_STEPS_PER_SEC, 3
                ),
                "ms_per_step": round(1000.0 * elapsed / N_STEPS, 3),
                "dropped_pairs": dropped,
                "overflow_constraints": num_overflow,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
