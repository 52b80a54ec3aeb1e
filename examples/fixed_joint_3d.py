"""Fixed joint (reference `fixed_joint_3d.rs`): two cubes welded rigidly
fall and land as one unit."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from avian_tpu import BodyType, JointType, PhysicsConfig, SceneBuilder
from avian_tpu.pipeline.step import rollout


def main():
    b = SceneBuilder()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0, 1, 0))
    a = b.add_body(pos=(0, 2.0, 0))
    b.box(a, 0.25, 0.25, 0.25)
    c = b.add_body(pos=(1.0, 2.0, 0))
    b.box(c, 0.25, 0.25, 0.25)
    b.add_joint(
        JointType.FIXED, a, c, anchor_a=(0.5, 0, 0), anchor_b=(-0.5, 0, 0)
    )
    world = b.finalize(
        max_bodies=4, max_colliders=4, max_contacts=16, max_joints=1
    )
    world = rollout(world, PhysicsConfig(max_colors=4), 300)

    pa = np.asarray(world.bodies.pos[a])
    pc = np.asarray(world.bodies.pos[c])
    rel = pc - pa
    # Welded: relative offset preserved through the fall and landing.
    np.testing.assert_allclose(rel, [1.0, 0.0, 0.0], atol=0.05)
    assert abs(pa[1] - 0.25) < 0.05 and abs(pc[1] - 0.25) < 0.05
    print(f"fixed joint: welded pair landed, offset {rel.round(3)}")


if __name__ == "__main__":
    main()
