"""Dynamic character 2D (reference `dynamic_character_2d/`): a circle
with locked rotation on the native [N,2] engine, driven by writing its
horizontal velocity. The contact solver does the rest (ground, step,
wall)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from avian_tpu import PhysicsConfig
from avian_tpu.core.types import BodyType
from avian_tpu.dim2 import SceneBuilder2D, rollout_2d
from avian_tpu.dim2.state import LOCK_ROT


def main():
    b = SceneBuilder2D()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1), friction=0.2)
    step_b = b.add_body(body_type=BodyType.STATIC, pos=(2.5, 0.1))
    b.box(step_b, 0.8, 0.1)  # a 0.2 m step
    wall = b.add_body(body_type=BodyType.STATIC, pos=(6.0, 1.5))
    b.box(wall, 0.3, 3.0)
    hero = b.add_body(
        pos=(0.0, 0.5), locked_axes=LOCK_ROT, sleep_disabled=True
    )
    b.circle(hero, 0.45, friction=0.2)
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=32)

    cfg = PhysicsConfig(max_colors=4)

    # Drive the horizontal velocity EVERY tick (the reference applies its
    # movement input each fixed update), keeping the solver-owned vy.
    from avian_tpu.dim2.step import physics_step_2d

    def drive(wc, _):
        lv = wc.bodies.lin_vel.at[hero, 0].set(2.0)
        wc = wc.replace(bodies=wc.bodies.replace(lin_vel=lv))
        return physics_step_2d(wc, cfg), None

    w = jax.jit(
        lambda wc: jax.lax.scan(drive, wc, None, length=180)[0]
    )(w)

    p = np.asarray(w.bodies.pos[hero])
    ang = float(w.bodies.angle[hero])
    assert np.isfinite(p).all()
    # Hopped the step and stopped at the wall face (x = 5.7 - 0.45).
    assert p[0] > 3.5, f"did not advance: {p}"
    assert p[0] < 5.35, f"went through the wall: {p}"
    assert abs(ang) < 1e-3, f"rotation lock failed: {ang}"
    print(f"dynamic_character_2d: stopped at x={p[0]:.2f}, angle {ang:.4f}")


if __name__ == "__main__":
    main()
