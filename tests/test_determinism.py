"""Run-to-run bitwise determinism on the FallingHinges scene — the
reference's cross-platform determinism harness
(``src/tests/determinism_2d.rs:28-60``) as a golden-hash test."""

import hashlib

import jax
import numpy as np

from avian_tpu import PhysicsConfig
from avian_tpu.pipeline.step import rollout
from avian_tpu.scenes import falling_hinges

# 64 Hz like the reference's determinism protocol.
CFG = PhysicsConfig(dt=1.0 / 64.0, max_colors=4, shape_pairs=((2, 2), (2, 3)))


def _hash_state(world):
    h = hashlib.sha256()
    h.update(np.asarray(world.bodies.pos).tobytes())
    h.update(np.asarray(world.bodies.quat).tobytes())
    return h.hexdigest()


def _run_once(steps=300):
    world, _ = falling_hinges(rows=8, cols=2)
    roll = jax.jit(lambda w: rollout(w, CFG, 60))
    for _ in range(steps // 60):
        world = roll(world)
    return world


def test_falling_hinges_bitwise_deterministic():
    w1 = _run_once()
    w2 = _run_once()
    assert np.isfinite(np.asarray(w1.bodies.pos)).all()
    h1, h2 = _hash_state(w1), _hash_state(w2)
    assert h1 == h2, (h1, h2)
    # Sanity: boxes ended up resting on/near the ground, still hinged.
    y = np.asarray(w1.bodies.pos)[1:, 1]
    assert (y > 0.0).all() and (y < 6.0).all()
