"""Distance joint 2D (reference `distance_joint_2d.rs`): a ball tethered
to a static anchor by a min/max distance band on the native 2D engine."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from avian_tpu import JointType, PhysicsConfig
from avian_tpu.core.types import BodyType
from avian_tpu.dim2 import SceneBuilder2D, rollout_2d


def main():
    b = SceneBuilder2D()
    anchor = b.add_body(body_type=BodyType.STATIC, pos=(0.0, 4.0))
    ball = b.add_body(pos=(0.3, 3.5))
    b.circle(ball, 0.2)
    b.add_joint(
        JointType.DISTANCE, anchor, ball,
        limit_min=1.5, limit_max=2.0, lin_damping=1.0,
    )
    w = b.finalize(max_bodies=2, max_colliders=2, max_contacts=8, max_joints=1)
    w = rollout_2d(w, PhysicsConfig(max_colors=4), 300)

    d = float(np.linalg.norm(np.asarray(w.bodies.pos[ball]) - [0.0, 4.0]))
    assert 1.45 < d < 2.05, f"distance band violated: {d}"
    print(f"distance_joint_2d: tether length {d:.3f} in [1.5, 2.0]")


if __name__ == "__main__":
    main()
