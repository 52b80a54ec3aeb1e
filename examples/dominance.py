"""Dominance (reference `RigidBody` Dominance, `rigid_body/mod.rs:662`):
a higher-dominance body pushes lower-dominance bodies but is immune to
their impulses."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from avian_tpu import PhysicsConfig, SceneBuilder
from avian_tpu.pipeline.step import rollout


def main():
    b = SceneBuilder()
    bully = b.add_body(
        pos=(0, 0, 0), lin_vel=(2.0, 0, 0), gravity_scale=0.0, dominance=10
    )
    b.sphere(bully, 0.5)
    victim = b.add_body(pos=(2.0, 0, 0), gravity_scale=0.0, dominance=0)
    b.sphere(victim, 0.5)
    world = b.finalize(max_bodies=2, max_colliders=2, max_contacts=8)
    world = rollout(world, PhysicsConfig(max_colors=4), 90)

    vb = np.asarray(world.bodies.lin_vel[bully])
    vv = np.asarray(world.bodies.lin_vel[victim])
    # The bully plows through unchanged; the victim is shoved up to the
    # bully's speed (inelastic push — restitution 0).
    np.testing.assert_allclose(vb, [2.0, 0, 0], atol=0.02)
    assert vv[0] > 1.9, f"victim should be pushed ahead: {vv}"
    print(f"dominance: bully kept v={vb.round(3)}, victim pushed to "
          f"v={vv.round(3)}")


if __name__ == "__main__":
    main()
