"""Cylinder / cone narrowphase acceptance: resting stability through the
full pipeline (VERDICT round-1 item 4: "a cylinder stack rests stably").
Exercises the generic support-map path (``geometry/convex.py``)."""

import jax
import jax.numpy as jnp
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.core.types import ShapeType
from avian_tpu.geometry.narrowphase import compute_manifold
from avian_tpu.pipeline.step import rollout

CFG = PhysicsConfig(
    max_colors=4,
    shape_pairs=(
        (ShapeType.PLANE, ShapeType.CYLINDER),
        (ShapeType.CYLINDER, ShapeType.CYLINDER),
        (ShapeType.PLANE, ShapeType.CONE),
    ),
)
_ROLL = None


def _run(world, steps):
    global _ROLL
    if _ROLL is None:
        _ROLL = jax.jit(lambda w: rollout(w, CFG, 60))
    for _ in range((steps + 59) // 60):
        world = _ROLL(world)
    return world


def _world():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    # Stack of 3 upright cylinders (r=0.5, h=1).
    stack = []
    for k in range(3):
        body = b.add_body(pos=(0.02 * (k % 2), 0.5 + 1.0 * k, 0))
        b.cylinder(body, 0.5, 1.0)
        stack.append(body)
    # A cone resting on its base nearby.
    cone = b.add_body(pos=(3.0, 0.55, 0))
    b.cone(cone, 0.5, 1.0)
    return b.finalize(max_bodies=8, max_colliders=8, max_contacts=64), stack, cone


def test_cylinder_stack_rests_and_cone_rests():
    world, stack, cone = _world()
    world = _run(world, 240)
    pos = np.asarray(world.bodies.pos)
    quat = np.asarray(world.bodies.quat)
    assert np.isfinite(pos).all()
    # Stack intact: each cylinder near its slot height, upright.
    for k, body in enumerate(stack):
        assert abs(pos[body][1] - (0.5 + 1.0 * k)) < 0.08, (k, pos[body])
        # Upright: x/z quat components stay tiny.
        assert abs(quat[body][0]) < 0.05 and abs(quat[body][2]) < 0.05
    # Cone rests on its base at half-height.
    assert abs(pos[cone][1] - 0.5) < 0.05, pos[cone]
    assert abs(quat[cone][0]) < 0.05 and abs(quat[cone][2]) < 0.05
    # Everything asleep (settled).
    sleeping = np.asarray(world.bodies.sleeping)
    assert sleeping[np.asarray(stack)].all() and sleeping[cone]


def test_lying_cylinder_does_not_roll_away():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    s2 = float(np.sin(np.pi / 4)); c2 = float(np.cos(np.pi / 4))
    body = b.add_body(pos=(0, 0.52, 0), quat=(0, 0, -s2, c2))  # axis -> X
    b.cylinder(body, 0.5, 2.0)
    world, = (b.finalize(max_bodies=4, max_colliders=4, max_contacts=32),)
    world = _run(world, 180)
    pos = np.asarray(world.bodies.pos)[body]
    assert np.isfinite(pos).all()
    assert abs(pos[1] - 0.5) < 0.03, pos     # resting on its side
    assert abs(pos[0]) < 0.2 and abs(pos[2]) < 0.2  # no drift


def test_capsule_box_corner_distance_accuracy():
    """Separation accuracy at a capsule-vs-box-corner configuration.

    Regression for the character-controller stall: vanilla Frank-Wolfe
    zigzagged at O(1/k) near Minkowski-polytope edges and reported ~0.08
    less separation than true at this pose (so shape casts stopped early
    with a flat normal and move_and_slide could not climb a step). The
    working-set (triangle-projection) iteration + depth-based near-zone
    classification keep the error < 5e-3 through the contact transition.
    """
    import numpy as np

    ID = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
    box_pos = jnp.asarray([2.5, 0.1, 0.0], jnp.float32)
    box_prm = jnp.zeros(8).at[:3].set(jnp.asarray([0.8, 0.1, 1.0]))
    cap_prm = jnp.zeros(8).at[:2].set(jnp.asarray([0.5, 0.4]))
    pairs = ((int(ShapeType.CAPSULE), int(ShapeType.BOX)),)
    for x in [1.20, 1.25, 1.30, 1.34, 1.3641, 1.40, 1.45]:
        cap_pos = jnp.asarray([x, 0.91, 0.0], jnp.float32)
        m = compute_manifold(
            jnp.asarray(int(ShapeType.CAPSULE)), cap_pos, ID, cap_prm,
            jnp.asarray(int(ShapeType.BOX)), box_pos, ID, box_prm,
            shape_pairs=pairs,
        )
        sep = float(jnp.min(m.separation))
        # Analytic: capsule bottom-sphere center vs clamped box point.
        c = np.array([x, 0.41, 0.0])
        q = np.array([
            min(max(c[0], 1.7), 3.3), min(max(c[1], 0.0), 0.2), 0.0,
        ])
        true_sep = float(np.linalg.norm(c - q)) - 0.4
        assert abs(sep - true_sep) < 5e-3, (
            f"x={x}: sep {sep} vs analytic {true_sep}"
        )
        n = np.asarray(m.normal)
        true_n = (q - c) / np.linalg.norm(q - c)
        assert float(n @ true_n) > 0.98, f"x={x}: normal {n} vs {true_n}"
