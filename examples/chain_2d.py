"""Chain 2D (reference `chain_2d.rs`): a chain of revolute-linked boxes
dangles from a static anchor on the native [N,2] engine and settles into
a hanging catenary-ish rest without stretching."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from avian_tpu import JointType, PhysicsConfig
from avian_tpu.core.types import BodyType
from avian_tpu.dim2 import SceneBuilder2D, rollout_2d

N_LINKS = 8
LINK = 0.5  # center-to-center spacing


def main():
    b = SceneBuilder2D()
    anchor = b.add_body(body_type=BodyType.STATIC, pos=(0.0, 5.0))
    prev = anchor
    links = []
    for k in range(N_LINKS):
        # Built horizontally; gravity swings the chain down.
        body = b.add_body(pos=((k + 1) * LINK, 5.0))
        b.capsule(body, 0.08, LINK - 0.2)
        links.append(body)
        b.add_joint(
            JointType.REVOLUTE, prev, body,
            anchor_a=(0.0, 0.0) if prev == anchor else (LINK / 2, 0.0),
            anchor_b=(-LINK / 2, 0.0),
            ang_damping=1.0, lin_damping=1.0,
        )
        prev = body
    w = b.finalize(
        max_bodies=N_LINKS + 1, max_colliders=N_LINKS,
        max_contacts=8 * N_LINKS, max_joints=N_LINKS,
    )
    w = rollout_2d(w, PhysicsConfig(max_colors=8), 500)

    pos = np.asarray(w.bodies.pos)
    assert np.isfinite(pos).all()
    # Each joint gap stays closed (no stretching).
    pts = [np.asarray([0.0, 5.0])]
    for k, body in enumerate(links):
        pts.append(pos[body])
    for a, c in zip(pts[:-1], pts[1:]):
        gap = float(np.linalg.norm(c - a))
        assert gap < LINK * 1.15, f"chain stretched: {gap}"
    # Damped chain hangs: the tip ends well below the anchor.
    tip = pos[links[-1]]
    assert tip[1] < 5.0 - 0.6 * N_LINKS * LINK, f"chain did not hang: {tip}"
    print(f"chain_2d: {N_LINKS} links, tip at {tip.round(3)}")


if __name__ == "__main__":
    main()
