"""Render interpolation: simulate at 30 Hz, render at 120 Hz by blending
consecutive physics states (the reference's interpolation.rs example /
bevy_transform_interpolation)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step
from avian_tpu.utils.interpolation import extrapolate_poses, interpolate_poses


def main():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    ball = b.add_body(pos=(0, 4.0, 0), lin_vel=(2.0, 0.0, 0.0))
    b.sphere(ball, 0.5, restitution=0.6)
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)

    cfg = PhysicsConfig(dt=1.0 / 30.0)
    step = jax.jit(lambda w: physics_step(w, cfg))

    frames = []
    prev = world
    for _ in range(30):  # 1 s of physics at 30 Hz
        nxt = step(prev)
        for k in range(4):  # 4 render frames per physics step = 120 Hz
            pos_b, _quat_b = interpolate_poses(
                prev.bodies, nxt.bodies, k / 4.0
            )
            frames.append(np.asarray(pos_b[ball]))
        prev = nxt
    frames = np.asarray(frames)
    assert np.isfinite(frames).all()
    # 120 interpolated frames; per-frame motion must be smooth (no jumps
    # larger than ~ v*dt_render + bounce discontinuity bound).
    jumps = np.linalg.norm(np.diff(frames, axis=0), axis=-1)
    assert jumps.max() < 0.2, jumps.max()
    # Extrapolation predicts the next render frame from velocities.
    ex_pos, _ex_quat = extrapolate_poses(prev.bodies, 1.0 / 120.0)
    assert np.isfinite(np.asarray(ex_pos)).all()
    print(f"interpolation OK: 120 render frames from 30 physics steps, "
          f"max inter-frame jump {jumps.max():.3f} m")


if __name__ == "__main__":
    main()
