"""Trimesh colliders (reference `trimesh_shapes_3d.rs`): balls dropped
onto a V-shaped static triangle mesh roll into the valley."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.pipeline.step import rollout


def main():
    # V-shaped trough: two inclined quads meeting at the z-axis.
    verts = np.asarray(
        [
            [-4.0, 2.0, -4.0], [0.0, 0.0, -4.0], [4.0, 2.0, -4.0],
            [-4.0, 2.0, 4.0], [0.0, 0.0, 4.0], [4.0, 2.0, 4.0],
        ],
        np.float32,
    )
    faces = np.asarray(
        [[0, 1, 3], [1, 4, 3], [1, 2, 4], [2, 5, 4]], np.int32
    )
    b = SceneBuilder()
    mesh = b.add_body(body_type=BodyType.STATIC)
    b.trimesh(mesh, verts, faces, friction=0.1)
    balls = []
    for x in (-2.5, 2.0):
        body = b.add_body(pos=(x, 4.0, 0.0))
        b.sphere(body, 0.4, friction=0.1)
        balls.append(body)
    world = b.finalize(max_bodies=4, max_colliders=8, max_contacts=64)
    world = rollout(world, PhysicsConfig(max_colors=4), 300)

    pos = np.asarray(world.bodies.pos)
    assert np.isfinite(pos).all()
    for body in balls:
        # Rolled into the valley near x=0, resting on the V.
        assert abs(pos[body][0]) < 1.0, f"ball did not roll in: {pos[body]}"
        assert 0.2 < pos[body][1] < 1.5, f"bad rest height: {pos[body]}"
    print(f"trimesh: balls settled at {pos[balls][:, :2].round(2).tolist()}")


if __name__ == "__main__":
    main()
