"""Marble pit (reference `move_marbles.rs`): a crowd of marbles driven
by user forces toward a moving target point, contained by walls."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import math

import numpy as np
import jax
import jax.numpy as jnp

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step
from avian_tpu.core.types import ShapeType

N = 64


def main():
    b = SceneBuilder()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0, 1, 0), friction=0.2)
    rng = np.random.default_rng(0)
    marbles = []
    for i in range(N):
        x, z = rng.uniform(-3, 3, 2)
        body = b.add_body(pos=(x, 0.5 + 0.3 * (i % 8), z))
        b.sphere(body, 0.2, friction=0.2)
        marbles.append(body)
    world = b.finalize(
        max_bodies=N + 1, max_colliders=N + 1, max_contacts=16 * N
    )
    config = PhysicsConfig(
        max_colors=8,
        shape_pairs=(
            (ShapeType.SPHERE, ShapeType.SPHERE),
            (ShapeType.SPHERE, ShapeType.PLANE),
        ),
    )
    marble_mask = jnp.asarray(np.arange(world.bodies.capacity) <= N)

    @jax.jit
    def driven_step(w, target):
        # Steer every marble toward the target (the reference moves them
        # with forces each frame).
        to_target = target[None, :] - w.bodies.pos
        force = 4.0 * to_target * marble_mask[:, None]
        force = force.at[:, 1].set(0.0)
        w = w.replace(bodies=w.bodies.replace(force=force))
        return physics_step(w, config)

    for step_i in range(240):
        ang = 2 * math.pi * step_i / 240.0
        target = jnp.asarray(
            [3.0 * math.cos(ang), 0.0, 3.0 * math.sin(ang)], jnp.float32
        )
        world = driven_step(world, target)

    pos = np.asarray(world.bodies.pos[1:N + 1])
    assert np.isfinite(pos).all()
    # The swarm followed the orbiting target: it is off-center and compact.
    center = pos.mean(axis=0)
    assert np.linalg.norm(center[[0, 2]]) > 0.8, f"swarm center {center}"
    print(f"marbles: swarm center {center.round(2)}, "
          f"spread {pos.std(axis=0).round(2)}")


if __name__ == "__main__":
    main()
