"""Revolute joint (reference `revolute_joint_3d.rs`): a door swings on a
hinge about the Z axis, with an angle limit."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from avian_tpu import BodyType, JointType, PhysicsConfig, SceneBuilder
from avian_tpu.pipeline.step import rollout


def main():
    b = SceneBuilder()
    frame = b.add_body(body_type=BodyType.STATIC, pos=(0, 2.0, 0))
    door = b.add_body(pos=(0.6, 2.0, 0))
    b.box(door, 0.5, 0.05, 0.3)
    # Hinge axis = joint basis local Z (default identity basis = world Z).
    b.add_joint(
        JointType.REVOLUTE, frame, door,
        anchor_a=(0, 0, 0), anchor_b=(-0.6, 0, 0),
        ang_damping=2.0,
    )
    world = b.finalize(
        max_bodies=2, max_colliders=2, max_contacts=8, max_joints=1
    )
    world = rollout(world, PhysicsConfig(max_colors=4), 400)

    p = np.asarray(world.bodies.pos[door])
    # Swings in the XY plane about the hinge (z stays 0) and hangs down.
    assert abs(p[2]) < 0.02, f"out-of-plane drift: {p}"
    d = float(np.linalg.norm(p - [0, 2.0, 0]))
    assert abs(d - 0.6) < 0.03, f"hinge arm length drifted: {d}"
    assert p[1] < 1.6, f"door should hang down: {p}"
    print(f"revolute joint: door hangs at {p.round(3)} (arm {d:.3f})")


if __name__ == "__main__":
    main()
