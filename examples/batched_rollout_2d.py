"""RL-style batched 2D rollout on the dedicated [N,2] engine: hundreds of
domain-randomized scenes stepped in lockstep with vmap, sharded over all
available devices — the cheap-profile counterpart of
``examples/batched_rollout.py`` (2D scenes pay 2D compute, not 3D).

Run: python examples/batched_rollout_2d.py [num_scenes]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import numpy as np

from avian_tpu import PhysicsConfig
from avian_tpu.dim2 import scenes as scenes2d
from avian_tpu.parallel import (
    make_batched_step_2d,
    make_scene_mesh,
    make_sharded_step_2d,
    replicate_world,
    shard_world,
)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    config = PhysicsConfig(substeps=4, max_colors=4)
    world, ids = scenes2d.box_pyramid_2d(base=6)  # 21 boxes per scene

    batched = replicate_world(world, batch)
    # Domain randomization: per-scene gravity jitter.
    key = jax.random.PRNGKey(0)
    gj = 1.0 + 0.1 * jax.random.normal(key, (batch,))
    batched = batched.replace(gravity=batched.gravity * gj[:, None])

    devices = jax.devices()
    if len(devices) > 1:
        mesh = make_scene_mesh(devices)
        batched = shard_world(batched, mesh)
        step = make_sharded_step_2d(config, mesh)
    else:
        step = make_batched_step_2d(config)

    out = step(batched)
    jax.block_until_ready(out.bodies.pos)
    n_steps = 60
    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = step(out)
    jax.block_until_ready(out.bodies.pos)
    dt = time.perf_counter() - t0

    pos = np.asarray(out.bodies.pos)
    assert np.isfinite(pos).all(), "NaN in batched 2D rollout"
    # Every scene's pyramid must stay above its ground.
    assert (pos[:, 1:, 1] > -0.1).all(), "a pyramid fell through the ground"

    env_steps = batch * n_steps / dt
    print(
        f"{batch} 2D scenes x {n_steps} steps in {dt:.2f}s = "
        f"{env_steps:,.0f} env*steps/s "
        f"({env_steps * len(ids):,.0f} body*steps/s) on "
        f"{len(devices)} device(s)"
    )


if __name__ == "__main__":
    main()
