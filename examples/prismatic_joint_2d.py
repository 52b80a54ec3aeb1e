"""Prismatic joint 2D (reference `prismatic_joint_2d.rs`): a block slides
on a vertical rail under gravity and rests at the lower travel limit."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import math

import numpy as np

from avian_tpu import JointType, PhysicsConfig
from avian_tpu.core.types import BodyType
from avian_tpu.dim2 import SceneBuilder2D, rollout_2d


def main():
    b = SceneBuilder2D()
    rail = b.add_body(body_type=BodyType.STATIC, pos=(0.0, 3.0))
    block = b.add_body(pos=(0.0, 2.0))
    b.box(block, 0.3, 0.3)
    b.add_joint(
        JointType.PRISMATIC, rail, block,
        axis_angle=math.pi / 2,  # slide along +Y
        limit_enabled=True, limit_min=-2.5, limit_max=0.0,
    )
    w = b.finalize(max_bodies=2, max_colliders=2, max_contacts=8, max_joints=1)
    w = rollout_2d(w, PhysicsConfig(max_colors=4), 300)

    p = np.asarray(w.bodies.pos[block])
    assert abs(p[0]) < 0.02, f"slider drifted off the rail: {p}"
    assert -3.0 < p[1] - 3.0 < -2.3, f"should rest at the lower limit: {p}"
    print(f"prismatic_joint_2d: block rests at rail offset {p[1] - 3.0:.3f}")


if __name__ == "__main__":
    main()
