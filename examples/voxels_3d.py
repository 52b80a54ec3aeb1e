"""Voxel colliders (reference `voxels_3d.rs`): a voxel staircase built
from an occupancy grid; a ball dropped above it comes to rest on a step."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.pipeline.step import rollout


def main():
    # Staircase occupancy: column x filled up to height x.
    occ = np.zeros((4, 4, 3), bool)
    for x in range(4):
        occ[x, : x + 1, :] = True
    b = SceneBuilder()
    vox = b.add_body(body_type=BodyType.STATIC)
    b.voxels(vox, occ, voxel_size=1.0, origin=(0.0, 0.0, 0.0))
    ball = b.add_body(pos=(1.5, 5.0, 1.5))
    b.sphere(ball, 0.4)
    world = b.finalize(max_bodies=4, max_colliders=64, max_contacts=256)
    world = rollout(world, PhysicsConfig(max_colors=4), 240)

    p = np.asarray(world.bodies.pos[ball])
    assert np.isfinite(p).all()
    # Column x=1 is 2 voxels tall -> top surface at y=2; ball rests at 2.4.
    assert abs(p[1] - 2.4) < 0.1, f"ball should rest on the step: {p}"
    print(f"voxels: ball rests on the staircase at {p.round(2)}")


if __name__ == "__main__":
    main()
