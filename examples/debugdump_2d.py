"""Schedule graph dump, 2D (reference
`crates/avian2d/examples/debugdump_2d.rs`): the dedicated [N,2] 2D
profile's stage graph as Graphviz DOT + the primitive counts XLA
compiles for `avian_tpu.dim2.step.physics_step_2d`."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from avian_tpu import BodyType, PhysicsConfig
from avian_tpu.dim2.builder import SceneBuilder2D
from avian_tpu.dim2.step import physics_step_2d
from avian_tpu.utils import debugdump


def main():
    cfg = PhysicsConfig(max_colors=4)
    dot = debugdump.schedule_dot(cfg, dim2=True)
    print(dot)

    b = SceneBuilder2D()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1))
    ball = b.add_body(pos=(0, 2))
    b.circle(ball, 0.5)
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    summary = debugdump.jaxpr_summary(
        w, cfg, step_fn=lambda w: physics_step_2d(w, cfg)
    )
    print(summary, file=_sys.stderr)

    assert "digraph physics_step" in dot
    assert "narrow_phase" in dot and "update_sleeping" in dot
    assert "primitive applications" in summary


if __name__ == "__main__":
    main()
