"""Hanging joint chain (reference `chain_3d.rs` example)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import numpy as np

from avian_tpu import PhysicsConfig, physics_step
from avian_tpu.core.types import JointType
from avian_tpu.scenes import joint_chain


def main():
    world, ids = joint_chain(n_links=12, jtype=JointType.SPHERICAL)
    config = PhysicsConfig()
    for _ in range(240):
        world = physics_step(world, config)
    pos = np.asarray(world.bodies.pos)
    # Link-to-link distances should stay near the chain pitch.
    gaps = np.linalg.norm(np.diff(pos[1:], axis=0), axis=-1)
    print("link gaps:", np.round(gaps, 3))
    print("tip:", np.round(pos[ids[-1]], 3))


if __name__ == "__main__":
    main()
