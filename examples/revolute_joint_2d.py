"""Revolute joint 2D (reference `revolute_joint_2d.rs`): a damped
pendulum on the native [N,2] engine swings down and hangs on its hinge."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from avian_tpu import JointType, PhysicsConfig
from avian_tpu.core.types import BodyType
from avian_tpu.dim2 import SceneBuilder2D, rollout_2d


def main():
    b = SceneBuilder2D()
    anchor = b.add_body(body_type=BodyType.STATIC, pos=(0.0, 3.0))
    bob = b.add_body(pos=(1.2, 3.0))
    b.box(bob, 0.5, 0.1)
    b.add_joint(
        JointType.REVOLUTE, anchor, bob,
        anchor_a=(0, 0), anchor_b=(-1.2, 0),
        ang_damping=2.0, lin_damping=2.0,
    )
    w = b.finalize(max_bodies=2, max_colliders=2, max_contacts=8, max_joints=1)
    w = rollout_2d(w, PhysicsConfig(max_colors=4), 400)

    p = np.asarray(w.bodies.pos[bob]) - [0.0, 3.0]
    arm = float(np.linalg.norm(p))
    assert abs(arm - 1.2) < 0.03, f"hinge arm drifted: {arm}"
    assert p[1] < -1.0, f"damped pendulum should hang down: {p}"
    print(f"revolute_joint_2d: bob hangs at offset {p.round(3)} (arm {arm:.3f})")


if __name__ == "__main__":
    main()
