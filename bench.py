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
    world, ids = cube_pile(n_cubes=N_CUBES, max_contacts=8 * N_CUBES)

    step = jax.jit(lambda w: physics_step(w, config))

    # Warm up: compile + let the pile make contact so we measure the
    # contact-rich steady state, not free fall.
    world = step(world)
    jax.block_until_ready(world.bodies.pos)
    for _ in range(20):
        world = step(world)
    jax.block_until_ready(world.bodies.pos)

    t_before = float(world.time)
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        world = step(world)
    jax.block_until_ready(world.bodies.pos)
    elapsed = time.perf_counter() - t0

    # Sanity: the simulation must actually have advanced and stayed finite
    # (guards against degenerate executables from remote-compile flakes).
    import numpy as np

    t_after = float(world.time)
    assert abs(t_after - t_before - N_STEPS / 60.0) < 1e-3, (
        f"sim time did not advance correctly: {t_before} -> {t_after}"
    )
    assert bool(np.isfinite(np.asarray(world.bodies.pos)).all()), "NaN state"

    # Validate capacity: no silently dropped pairs (cheap separate check
    # to avoid recompiling the full step with diagnostics).
    from avian_tpu.pipeline import broadphase as bp_m

    @jax.jit
    def check(w):
        w = bp_m.update_aabbs(w, config)
        return bp_m.broad_phase(w, config).dropped

    dropped = int(check(world))

    steps_per_sec = N_STEPS / elapsed
    body_steps_per_sec = steps_per_sec * N_CUBES
    print(
        json.dumps(
            {
                "metric": f"body_steps_per_sec_cube_pile_{N_CUBES}",
                "value": round(body_steps_per_sec),
                "unit": "body*steps/sec",
                "vs_baseline": round(
                    body_steps_per_sec / BASELINE_BODY_STEPS_PER_SEC, 3
                ),
                "ms_per_step": round(1000.0 * elapsed / N_STEPS, 3),
                "dropped_pairs": dropped,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
