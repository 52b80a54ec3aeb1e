"""Prismatic joint (reference `prismatic_joint_3d.rs`): a slider
constrained to one axis with translation limits."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from avian_tpu import BodyType, JointType, PhysicsConfig, SceneBuilder
from avian_tpu.pipeline.step import rollout


def main():
    b = SceneBuilder()
    base = b.add_body(body_type=BodyType.STATIC, pos=(0, 2.0, 0))
    slider = b.add_body(pos=(0, 1.0, 0))
    b.box(slider, 0.3, 0.3, 0.3)
    # Primary axis = local Z of the joint basis; point it along -Y so the
    # slider can fall along it, limited to 1.5 units of travel.
    b.add_joint(
        JointType.PRISMATIC, base, slider,
        basis_a=(0.7071068, 0.0, 0.0, 0.7071068),  # Z axis -> -Y... rotate X 90deg: Z->-Y? (x,y,z,w)
        basis_b=(0.7071068, 0.0, 0.0, 0.7071068),
        limit_enabled=True, limit_min=-0.5, limit_max=1.5,
    )
    world = b.finalize(
        max_bodies=2, max_colliders=2, max_contacts=8, max_joints=1
    )
    world = rollout(world, PhysicsConfig(max_colors=4), 300)

    p = np.asarray(world.bodies.pos[slider])
    # Constrained on the axis: x and z stay ~0.
    assert abs(p[0]) < 0.05 and abs(p[2]) < 0.05, f"drifted off axis: {p}"
    # Fell along the axis until the limit.
    assert p[1] < 1.0, f"slider should slide down: {p}"
    assert p[1] > -0.1, f"limit should stop it: {p}"
    print(f"prismatic joint: slider rests at y={p[1]:.3f} within limits")


if __name__ == "__main__":
    main()
