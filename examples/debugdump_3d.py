"""Schedule graph dump, 3D (reference
`crates/avian3d/examples/debugdump_3d.rs`, which pipes
`bevy_mod_debugdump`'s DOT to stdout): print the physics step's stage
graph as Graphviz DOT, plus the primitive counts XLA actually compiles
(`python examples/debugdump_3d.py | dot -Tsvg` works on the first part)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.utils import debugdump


def main():
    cfg = PhysicsConfig(max_colors=4, swept_ccd=True)
    dot = debugdump.schedule_dot(cfg, hooks=True, custom_joints=False)
    print(dot)

    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    ball = b.add_body(pos=(0, 2, 0))
    b.sphere(ball, 0.5)
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    summary = debugdump.jaxpr_summary(
        w, PhysicsConfig(max_colors=4), top=40
    )
    print(summary, file=_sys.stderr)

    assert "digraph physics_step" in dot
    assert "broad_phase" in dot and "solve_swept_ccd" in dot
    assert "lax.scan x" in dot
    assert "primitive applications" in summary
    assert "scan" in summary  # the substep loop reaches XLA as one scan


if __name__ == "__main__":
    main()
