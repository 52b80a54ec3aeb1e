"""All five joint types in one scene, each demonstrating its constraint
(the reference's *_joint_* example family)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.core.types import JointType
from avian_tpu.pipeline.step import rollout


def main():
    b = SceneBuilder()
    anchors = []
    bodies = {}
    for k, jt in enumerate(
        [JointType.FIXED, JointType.DISTANCE, JointType.REVOLUTE,
         JointType.PRISMATIC, JointType.SPHERICAL]
    ):
        x = 3.0 * k
        a = b.add_body(body_type=BodyType.STATIC, pos=(x, 2.0, 0))
        anchors.append(a)
        body = b.add_body(pos=(x + 1.0, 2.0, 0))
        b.box(body, 0.3, 0.3, 0.3)
        bodies[jt] = body
        kw = dict(anchor_a=(1.0, 0.0, 0.0), anchor_b=(0.0, 0.0, 0.0))
        if jt == JointType.DISTANCE:
            kw.update(limit_min=0.8, limit_max=1.2)
        if jt == JointType.PRISMATIC:
            # Slide along world X, limited.
            kw.update(limit_min=-0.5, limit_max=1.5, limit_enabled=True)
            kw.update(basis_a=(0.0, 0.7071068, 0.0, 0.7071068))
            kw["basis_b"] = kw["basis_a"]
        b.add_joint(jt, a, body, **kw)
    world = b.finalize(
        max_bodies=16, max_colliders=16, max_contacts=64, max_joints=8
    )
    config = PhysicsConfig()
    world = jax.jit(lambda w: rollout(w, config, 240))(world)
    pos = np.asarray(world.bodies.pos)
    assert np.isfinite(pos).all()

    # Each joint's world pivot = static anchor position + (1, 0, 0).
    p_fixed = pos[bodies[JointType.FIXED]]
    assert np.allclose(p_fixed, (1.0, 2.0, 0.0), atol=0.05), p_fixed
    d = np.linalg.norm(pos[bodies[JointType.DISTANCE]] - (4.0, 2.0, 0.0))
    assert 0.7 < d < 1.3, d
    # Revolute/spherical bodies attach AT their pivot (anchor_b = origin):
    # they stay pinned there while free to rotate.
    p_rev = pos[bodies[JointType.REVOLUTE]]
    assert np.allclose(p_rev, (6.0 + 1.0, 2.0, 0.0), atol=0.05), p_rev
    p_pri = pos[bodies[JointType.PRISMATIC]]
    assert abs(p_pri[1] - 2.0) < 0.05 and abs(p_pri[2]) < 0.05
    assert 9.4 < p_pri[0] < 11.6, p_pri
    p_sph = pos[bodies[JointType.SPHERICAL]]
    assert np.allclose(p_sph, (12.0 + 1.0, 2.0, 0.0), atol=0.05), p_sph
    print("joints_tour OK: fixed rigid, distance in band "
          f"({d:.2f}), revolute/spherical pinned at their pivots, "
          "prismatic on-axis within limits")


if __name__ == "__main__":
    main()
