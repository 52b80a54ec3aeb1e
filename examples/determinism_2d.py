"""Determinism demo (reference `determinism_2d.rs` / Box2D FallingHinges):
two identical 500-step runs of 40 hinged falling boxes produce the SAME
position/rotation hash, bit for bit."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import hashlib

import numpy as np

from avian_tpu import PhysicsConfig
from avian_tpu.pipeline.step import rollout
from avian_tpu.scenes import falling_hinges


def run():
    world, _ = falling_hinges(rows=10, cols=4)
    world = rollout(world, PhysicsConfig(dt=1 / 64, max_colors=8), 500)
    return hashlib.sha256(
        np.ascontiguousarray(np.asarray(world.bodies.pos)).tobytes()
        + np.ascontiguousarray(np.asarray(world.bodies.quat)).tobytes()
    ).hexdigest()


def main():
    h1 = run()
    h2 = run()
    assert h1 == h2, f"non-deterministic: {h1} != {h2}"
    print(f"determinism_2d: identical hash over 500 steps: {h1[:16]}…")


if __name__ == "__main__":
    main()
