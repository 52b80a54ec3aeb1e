"""Continuous collision detection (reference `ccd.rs`): a fast bullet
vs a thin wall — speculative contacts (always on) catch it, and the
opt-in swept CCD handles the extreme case."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step
from avian_tpu.pipeline.step import rollout


def scene(swept: bool):
    b = SceneBuilder()
    wall = b.add_body(body_type=BodyType.STATIC, pos=(5.0, 0.0, 0.0))
    b.box(wall, 0.05, 3.0, 3.0)   # 10 cm thin wall
    bullet = b.add_body(
        pos=(0.0, 0.0, 0.0), lin_vel=(80.0, 0.0, 0.0), gravity_scale=0.0,
        swept_ccd=swept,
    )
    b.sphere(bullet, 0.1)
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    return w, bullet


def main():
    # 80 m/s x 1/60 s = 1.33 m per step through a 0.1 m wall.
    for swept in (False, True):
        config = PhysicsConfig(max_colors=4, swept_ccd=swept)
        w, bullet = scene(swept)
        w = rollout(w, config, 30)
        x = float(w.bodies.pos[bullet][0])
        assert x < 5.0, (
            f"bullet tunneled ({'swept' if swept else 'speculative'}): x={x}"
        )
        print(f"{'swept' if swept else 'speculative'} CCD stopped the "
              f"bullet at x={x:.3f} (wall at 5.0)")


if __name__ == "__main__":
    main()
