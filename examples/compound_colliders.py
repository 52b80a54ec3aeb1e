"""Compound colliders (reference `collider_constructors.rs` /
ColliderConstructorHierarchy): one body with multiple colliders — a
hammer (box head + capsule handle) whose auto mass properties come from
the parallel-axis sum of its parts."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.pipeline.step import rollout


def main():
    b = SceneBuilder()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0, 1, 0), friction=0.8)
    hammer = b.add_body(pos=(0, 1.5, 0))
    # Head: dense box offset to +x; handle: light capsule along x.
    b.box(hammer, 0.25, 0.15, 0.15, local_pos=(0.5, 0, 0), density=8.0,
          friction=0.8)
    b.capsule(hammer, 0.06, 0.8,
              local_pos=(-0.1, 0, 0),
              local_quat=(0, 0, 0.7071068, 0.7071068),  # along x
              friction=0.8)
    world = b.finalize(max_bodies=2, max_colliders=4, max_contacts=16)

    # COM is pulled toward the heavy head.
    com = np.asarray(world.bodies.com[hammer])
    assert com[0] > 0.25, f"COM should sit toward the head: {com}"

    world = rollout(world, PhysicsConfig(max_colors=4), 300)
    p = np.asarray(world.bodies.pos[hammer])
    assert np.isfinite(p).all()
    # Fell and came to rest on the ground (head or handle down).
    assert p[1] < 0.5, f"hammer should land: {p}"
    v = float(np.linalg.norm(np.asarray(world.bodies.lin_vel[hammer])))
    assert v < 0.2, f"hammer should settle: |v|={v}"
    print(f"compound: hammer (COM {com.round(3)}) settled at {p.round(3)}")


if __name__ == "__main__":
    main()
