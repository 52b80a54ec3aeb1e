"""Dedicated 2D engine showcase: the full avian2d-style surface on the
[N,2] profile in one headless scene — dynamics, forces, spatial queries,
shape casting, the kinematic character, and a debug-render snapshot.

Reference counterparts: the ``avian2d`` crate's example set
(``crates/avian2d/examples/``: ``move_and_slide_2d.rs``,
``ray_caster.rs``, ``cast_ray_predicate.rs``) compiled with ``dim2``
features — here served by ``avian_tpu.dim2`` instead of the locked-axes
3D pipeline.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from avian_tpu import BodyType, PhysicsConfig
from avian_tpu.dim2 import SceneBuilder2D, physics_step_2d
from avian_tpu.dim2 import character, forces, queries

CFG = PhysicsConfig(substeps=4, max_colors=4)


def main():
    b = SceneBuilder2D()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0.0, 1.0))
    wall = b.add_body(pos=(6.0, 2.0), body_type=BodyType.STATIC)
    b.box(wall, 0.5, 2.0)

    # A small pile of mixed 2D shapes.
    drops = []
    specs = [
        ("circle", (0.0, 1.0)),
        ("box", (0.1, 2.2)),
        ("capsule", (-0.1, 3.6)),
        ("pentagon", (0.05, 5.0)),
    ]
    for kind, pos in specs:
        body = b.add_body(pos=pos)
        if kind == "circle":
            b.circle(body, 0.45)
        elif kind == "box":
            b.box(body, 0.45, 0.45)
        elif kind == "capsule":
            b.capsule(body, 0.25, 0.8)
        else:
            b.regular_polygon(body, 0.5, 5)
        drops.append(body)
    world = b.finalize()

    # --- dynamics: let the pile settle -----------------------------------
    step = jax.jit(lambda w: physics_step_2d(w, CFG))
    for _ in range(240):
        world = step(world)
    pos = np.asarray(world.bodies.pos)
    assert np.isfinite(pos).all(), "NaN state"
    assert (pos[drops, 1] > 0.1).all(), "pile fell through the ground"
    assert (pos[drops, 1] < 4.0).all(), "pile failed to settle"

    # --- forces: kick the circle sideways --------------------------------
    world = forces.apply_linear_impulse(world, drops[0], (3.0, 0.0))
    for _ in range(30):
        world = step(world)
    assert float(world.bodies.pos[drops[0], 0]) > pos[drops[0], 0] + 0.2

    # --- queries: ray straight down over the pile -------------------------
    hit = queries.cast_ray(world, (0.0, 10.0), (0.0, -1.0))
    assert bool(hit.hit), "ray must hit the pile or the ground"
    assert float(hit.distance) < 10.0 + 1e-3

    # Predicate variant: ignore everything but the ground half-space.
    ground_hit = queries.cast_ray_predicate(
        world, (0.0, 10.0), (0.0, -1.0),
        predicate=lambda w, ids: w.colliders.is_plane[ids],
    )
    assert int(ground_hit.collider) == 0
    assert float(ground_hit.distance) == 10.0 or abs(
        float(ground_hit.distance) - 10.0
    ) < 1e-3

    # Shape cast: drop a probe circle onto the settled pile.
    probe = queries.shape_circle(0.3)
    sweep = queries.cast_shape(world, probe, (0.0, 10.0), 0.0, (0.0, -1.0), 20.0)
    assert bool(sweep.hit) and float(sweep.distance) < float(
        ground_hit.distance
    ), "probe must land on the pile before the ground"

    # --- character: walk toward the wall and stop --------------------------
    shape = queries.shape_capsule(0.4, 1.0)
    cpos = jnp.asarray([2.5, 0.91])
    move = jax.jit(
        lambda w, p: character.move_and_slide(
            w, shape, p, jnp.asarray([2.0, -0.5]), dt=1.0 / 15
        )
    )
    for _ in range(30):
        cpos, _, _ = move(world, cpos)
    cp = np.asarray(cpos)
    assert cp[1] > 0.85, "character sank into the ground"
    assert cp[0] <= 5.5 - 0.4 + 0.03, "character passed through the wall"
    assert cp[0] > 4.0, "character never reached the wall"

    # --- debug render snapshot ---------------------------------------------
    from avian_tpu.utils.debug_render import render_scene_2d

    out = "/tmp/native_2d_showcase.png"
    render_scene_2d(world, path=out, show_velocities=True)
    assert _os.path.exists(out)

    print("native_2d_showcase OK")


if __name__ == "__main__":
    main()
