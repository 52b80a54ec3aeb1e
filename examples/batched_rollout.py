"""RL-style batched rollout: thousands of domain-randomized scenes stepped
in lockstep with vmap, sharded over all available devices.

Run: python examples/batched_rollout.py [num_scenes]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import sys
import time

import jax
import jax.numpy as jnp

from avian_tpu import PhysicsConfig
from avian_tpu.parallel import (
    make_batched_step,
    make_scene_mesh,
    make_sharded_step,
    replicate_world,
    shard_world,
)
from avian_tpu.scenes import cube_pile


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    config = PhysicsConfig(substeps=4, max_colors=4, sap_window=8)
    world, _ = cube_pile(n_cubes=27, max_contacts=216)

    batched = replicate_world(world, batch)
    # Domain randomization: per-scene gravity jitter + height offsets.
    key = jax.random.PRNGKey(0)
    gj = 1.0 + 0.1 * jax.random.normal(key, (batch,))
    batched = batched.replace(gravity=batched.gravity * gj[:, None])

    devices = jax.devices()
    if len(devices) > 1:
        mesh = make_scene_mesh(devices)
        batched = shard_world(batched, mesh)
        step = make_sharded_step(config, mesh)
    else:
        step = make_batched_step(config)

    out = step(batched)
    jax.block_until_ready(out.bodies.pos)
    n_steps = 100
    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = step(out)
    jax.block_until_ready(out.bodies.pos)
    dt = time.perf_counter() - t0
    env_steps = batch * n_steps / dt
    print(f"{batch} scenes x {n_steps} steps in {dt:.2f}s = "
          f"{env_steps:,.0f} env*steps/s "
          f"({env_steps * 27:,.0f} body*steps/s) on {len(devices)} device(s)")


if __name__ == "__main__":
    main()
