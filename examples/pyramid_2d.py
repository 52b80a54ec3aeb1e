"""Large Pyramid 2D on the native 2D profile (reference `pyramid_2d.rs` /
bench scene `benches/src/dim2/large_pyramid.rs`): a base-16 box pyramid
settles without collapsing on the dedicated [N,2] engine."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from avian_tpu import PhysicsConfig
from avian_tpu.dim2 import rollout_2d
from avian_tpu.dim2.scenes import box_pyramid_2d


def main():
    world, ids = box_pyramid_2d(base=16)
    config = PhysicsConfig(substeps=4, max_colors=8)
    world = rollout_2d(world, config, 300)

    pos = np.asarray(world.bodies.pos)
    assert np.isfinite(pos).all()
    ys = pos[ids, 1]
    # Pyramid still standing: top row stayed high, bottom row grounded.
    assert ys.max() > 14.0, f"pyramid collapsed: top at {ys.max()}"
    assert abs(ys.min() - 0.5) < 0.05
    print(f"pyramid_2d (native 2D path): {len(ids)} boxes, "
          f"top at y={ys.max():.2f}, base at y={ys.min():.3f}")


if __name__ == "__main__":
    main()
