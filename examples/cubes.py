"""3D cube stacks settling on a plane (reference `cubes.rs` example),
with an optional debug-render snapshot.

Run: python examples/cubes.py [--render out.png]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import sys

import numpy as np

from avian_tpu import PhysicsConfig, physics_step
from avian_tpu.scenes import cube_pile


def main():
    world, ids = cube_pile(n_cubes=64)
    config = PhysicsConfig()
    for i in range(240):
        world = physics_step(world, config)
    ys = np.asarray(world.bodies.pos)[1:, 1]
    print(f"settled: min y={ys.min():.3f}, max y={ys.max():.3f}, "
          f"sleeping={int(np.asarray(world.bodies.sleeping).sum())}/{len(ids)}")

    if "--render" in sys.argv:
        out = sys.argv[sys.argv.index("--render") + 1]
        from avian_tpu.utils.debug_render import render_scene

        render_scene(world, out, show_islands=True)
        print("wrote", out)


if __name__ == "__main__":
    main()
