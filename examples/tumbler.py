"""Tumbler: a kinematically-spun hollow box churns a pile of cubes
(reference ``crates/avian3d/examples/`` tumbler-style stress scene — a
kinematic driver through contacts).

The tumbler body is KINEMATIC with constant angular velocity about Z; its
four wall colliders are compound children, so the spin drives the cubes.

Run: python examples/tumbler.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.pipeline.step import rollout


def build():
    b = SceneBuilder()
    # Spinning hollow box: 4 walls as a compound kinematic body.
    tumbler = b.add_body(
        body_type=BodyType.KINEMATIC, pos=(0, 0, 0), ang_vel=(0, 0, 0.8),
    )
    ext, th = 4.0, 0.3
    b.box(tumbler, ext + th, th, 1.5, local_pos=(0, -ext, 0))
    b.box(tumbler, ext + th, th, 1.5, local_pos=(0, ext, 0))
    b.box(tumbler, th, ext + th, 1.5, local_pos=(-ext, 0, 0))
    b.box(tumbler, th, ext + th, 1.5, local_pos=(ext, 0, 0))
    # Front/back walls keep cubes in the XY plane band.
    b.box(tumbler, ext, ext, th, local_pos=(0, 0, -1.2))
    b.box(tumbler, ext, ext, th, local_pos=(0, 0, 1.2))

    ids = []
    for i in range(6):
        for j in range(6):
            body = b.add_body(pos=(-1.5 + 0.62 * i, -1.5 + 0.62 * j, 0.0))
            b.box(body, 0.3, 0.3, 0.3)
            ids.append(body)
    world = b.finalize(max_bodies=40, max_colliders=48, max_contacts=1024)
    return world, ids


def main():
    world, ids = build()
    config = PhysicsConfig()
    roll = jax.jit(lambda w: rollout(w, config, 60))
    for sec in range(6):
        world = roll(world)
    pos = np.asarray(world.bodies.pos)[np.asarray(ids)]
    assert np.isfinite(pos).all(), "tumbler diverged"
    # Cubes stay inside the spinning box: within the inner wall faces
    # (walls at +-4 with half thickness 0.3 -> inner face 3.7; the
    # chamber rotates, so check against the rotated frame conservatively
    # via the per-axis max in the *body frame* of the tumbler).
    q = np.asarray(world.bodies.quat[0])
    x, y, z, w = q
    # Rotation about Z only: angle from quat.
    ang = 2.0 * np.arctan2(z, w)
    c, s_ = np.cos(-ang), np.sin(-ang)
    local_x = c * pos[:, 0] - s_ * pos[:, 1]
    local_y = s_ * pos[:, 0] + c * pos[:, 1]
    inside = (np.abs(local_x) < 3.8) & (np.abs(local_y) < 3.8) & (
        np.abs(pos[:, 2]) < 1.0
    )
    assert inside.all(), (
        f"cube escaped the tumbler: max |local| = "
        f"{max(np.abs(local_x).max(), np.abs(local_y).max()):.2f}"
    )
    # The kinematic spin actually churns the pile: cubes are awake/moving.
    vel = np.asarray(world.bodies.lin_vel)[np.asarray(ids)]
    assert np.abs(vel).max() > 0.05, "tumbler failed to drive the cubes"
    print(f"tumbler OK: 36 cubes contained (|local| < 3.8), "
          f"max |v|={np.abs(vel).max():.2f} m/s after 6 s of spin")


if __name__ == "__main__":
    main()
