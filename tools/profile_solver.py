"""Substep-loop variant experiment on the real device (10k pile).

Times the FULL physics_step under the forced-D2H slope protocol for:
  - max_colors in {12, 8, 6} (fewer colors = fewer dependent color rounds;
    overflow constraints fall into the Jacobi-relaxed last color)
  - substeps 4 (bench protocol)

Also reports each config's overflow count so the speed/quality trade is
explicit. Usage: python tools/profile_solver.py
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
from avian_tpu.pipeline.step import physics_step
from avian_tpu.scenes import cube_pile

N = int(os.environ.get("BENCH_CUBES", "10000"))
K1 = int(os.environ.get("PROF_K1", "4"))
K2 = int(os.environ.get("PROF_K2", "16"))


def forced(fn, w):
    t0 = time.perf_counter()
    out = fn(w)
    _ = float(out.bodies.pos[0, 0])
    return time.perf_counter() - t0, out


def main():
    base = PhysicsConfig(
        substeps=4,
        shape_pairs=(
            (ShapeType.BOX, ShapeType.BOX),
            (ShapeType.BOX, ShapeType.PLANE),
        ),
    )
    world0, _ = cube_pile(n_cubes=N, max_contacts=8 * N)
    step = jax.jit(lambda w: physics_step(w, base))
    world = step(world0)
    jax.block_until_ready(world.bodies.pos)
    for _ in range(60):
        world = step(world)
    _ = float(world.bodies.pos[0, 0])
    print(f"device={jax.devices()[0]} N={N} K1={K1} K2={K2}", flush=True)

    for mc in (12, 8, 6):
        cfg = PhysicsConfig(
            substeps=4, max_colors=mc,
            shape_pairs=base.shape_pairs,
        )

        def make(k):
            @jax.jit
            def many(w):
                def body(w_, _):
                    w2, diag = physics_step(
                        w_, cfg, return_diagnostics=True
                    )
                    return w2, diag["num_overflow"]
                return jax.lax.scan(body, w, None, length=k)
            return many

        f1, f2 = make(K1), make(K2)
        _t, (w1, ov1) = forced(f1, world)
        _t, _o = forced(f2, world)
        t1, _ = forced(f1, world)
        t2, (w2, ov2) = forced(f2, world)
        ms = (t2 - t1) / (K2 - K1) * 1e3
        print(
            f"max_colors={mc:>2}: {ms:8.3f} ms/step   "
            f"overflow={int(jnp.max(ov2))}",
            flush=True,
        )


if __name__ == "__main__":
    main()
