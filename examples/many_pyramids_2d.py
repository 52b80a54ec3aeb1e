"""Many Pyramids 2D (reference `many_pyramids_2d.rs` / bench scene
`benches/src/dim2/mod.rs:17-24`): a 3x3 field of base-6 box pyramids on
the native [N,2] engine all settle without collapsing."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from avian_tpu import PhysicsConfig
from avian_tpu.dim2 import rollout_2d
from avian_tpu.dim2.scenes import many_pyramids_2d


def main():
    world, ids = many_pyramids_2d(grid=3, base=6)
    world = rollout_2d(world, PhysicsConfig(substeps=4, max_colors=8), 240)

    pos = np.asarray(world.bodies.pos)
    assert np.isfinite(pos).all()
    ys = pos[ids, 1]
    n_per = 6 * 7 // 2
    assert len(ids) == 9 * n_per
    # Every pyramid keeps its top row high and its base grounded.
    for p in range(9):
        chunk = ys[p * n_per:(p + 1) * n_per]
        assert chunk.max() > 4.5, f"pyramid {p} collapsed: top {chunk.max()}"
        assert abs(chunk.min() - 0.5) < 0.05
    print(f"many_pyramids_2d: 9 pyramids x {n_per} boxes all standing")


if __name__ == "__main__":
    main()
