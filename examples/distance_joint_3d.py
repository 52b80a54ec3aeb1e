"""Distance joint (reference `distance_joint_3d.rs`): a box dangles from
a static anchor inside a [min, max] distance band."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from avian_tpu import BodyType, JointType, PhysicsConfig, SceneBuilder
from avian_tpu.pipeline.step import rollout


def main():
    b = SceneBuilder()
    anchor = b.add_body(body_type=BodyType.STATIC, pos=(0, 3.0, 0))
    b.box(anchor, 0.2, 0.2, 0.2)
    cube = b.add_body(pos=(0.3, 2.0, 0))
    b.box(cube, 0.25, 0.25, 0.25)
    b.add_joint(
        JointType.DISTANCE, anchor, cube,
        limit_min=1.5, limit_max=2.0, lin_damping=1.0,
    )
    world = b.finalize(
        max_bodies=2, max_colliders=2, max_contacts=8, max_joints=1
    )
    world = rollout(world, PhysicsConfig(max_colors=4), 300)

    p = np.asarray(world.bodies.pos[cube])
    d = float(np.linalg.norm(p - [0, 3.0, 0]))
    assert 1.45 < d < 2.05, f"distance band violated: {d}"
    assert p[1] < 1.6, f"cube should hang below the anchor: {p}"
    print(f"distance joint: cube hangs at distance {d:.3f} (band [1.5, 2.0])")


if __name__ == "__main__":
    main()
