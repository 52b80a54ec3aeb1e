"""Fixed joint 2D (reference `fixed_joint_2d.rs`): a bar welded to a
static post keeps its pose and orientation under gravity."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from avian_tpu import JointType, PhysicsConfig
from avian_tpu.core.types import BodyType
from avian_tpu.dim2 import SceneBuilder2D, rollout_2d


def main():
    b = SceneBuilder2D()
    post = b.add_body(body_type=BodyType.STATIC, pos=(0.0, 2.0))
    bar = b.add_body(pos=(1.0, 2.0))
    b.box(bar, 0.5, 0.1)
    b.add_joint(
        JointType.FIXED, post, bar, anchor_a=(0.5, 0), anchor_b=(-0.5, 0)
    )
    w = b.finalize(max_bodies=2, max_colliders=2, max_contacts=8, max_joints=1)
    w = rollout_2d(w, PhysicsConfig(max_colors=4), 200)

    p = np.asarray(w.bodies.pos[bar])
    ang = float(w.bodies.angle[bar])
    assert abs(p[0] - 1.0) < 0.05 and abs(p[1] - 2.0) < 0.05, f"weld moved: {p}"
    assert abs(ang) < 0.05, f"weld rotated: {ang}"
    print(f"fixed_joint_2d: bar held at {p.round(3)}, angle {ang:.4f}")


if __name__ == "__main__":
    main()
