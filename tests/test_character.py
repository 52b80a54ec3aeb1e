"""Character controller (move_and_slide) tests."""

import numpy as np
import jax.numpy as jnp

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, ShapeType
import functools
import jax

from avian_tpu.character import MoveAndSlideConfig, move_and_slide as _mas, project_velocity

# jit: the controller is meant to run inside a jitted game step; eagerly it
# pays per-op dispatch (hundreds of ops x 16-iteration casts).
move_and_slide = jax.jit(
    _mas, static_argnames=("shape_type", "config")
)
from avian_tpu.pipeline.broadphase import update_aabbs

from conftest import TEST_SHAPE_PAIRS
CFG = PhysicsConfig(max_colors=4, shape_pairs=TEST_SHAPE_PAIRS)
ID = (0.0, 0.0, 0.0, 1.0)


def _world_with_wall():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    wall = b.add_body(body_type=BodyType.STATIC, pos=(3.0, 1.0, 0.0))
    b.box(wall, 0.25, 2.0, 5.0)
    return update_aabbs(b.finalize(max_bodies=4, max_colliders=4, max_contacts=16), CFG)


def test_slide_along_ground():
    w = _world_with_wall()
    pos, vel, normal = move_and_slide(
        w, ShapeType.CAPSULE, (0.5, 0.4), (0.0, 0.89, 0.0), ID,
        (1.0, -1.0, 0.0), 1.0,
    )
    pos = np.asarray(pos)
    # Moved in +x, stayed on the ground (capsule half-height 0.5 + r 0.4).
    assert pos[0] > 0.5
    assert pos[1] > 0.85
    # Downward velocity projected out.
    assert float(vel[1]) >= -1e-3
    assert float(normal[1]) > 0.9


def test_blocked_by_wall():
    w = _world_with_wall()
    pos, vel, _ = move_and_slide(
        w, ShapeType.SPHERE, (0.4,), (0.0, 1.0, 0.0), ID, (5.0, 0.0, 0.0), 1.0
    )
    # Stopped in front of the wall face at x = 2.75 (minus radius & skin).
    assert float(pos[0]) < 2.75 - 0.4 + 0.02
    assert float(pos[0]) > 2.0
    # Velocity projected: no more x motion into the wall.
    assert float(vel[0]) <= 1e-3


def test_project_velocity_crease():
    v = jnp.asarray([1.0, -1.0, 0.0])
    n1 = jnp.asarray([0.0, 1.0, 0.0])
    planes = jnp.zeros((4, 3))
    out = project_velocity(v, n1, planes, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(out), [1, 0, 0], atol=1e-6)
    # Second plane forming a corner: velocity confined to the crease.
    planes = planes.at[0].set(n1)
    n2 = jnp.asarray([-1.0, 0.0, 0.0])
    out = project_velocity(jnp.asarray([1.0, -1.0, 0.2]), n2, planes, jnp.asarray(1))
    # Crease of (ground, wall) is the z axis.
    assert abs(float(out[0])) < 1e-5
    assert abs(float(out[1])) < 1e-5


def test_depenetrate():
    from avian_tpu.character import depenetrate

    w = _world_with_wall()
    p = depenetrate(w, ShapeType.SPHERE, (0.5,), (0.0, 0.2, 0.0), ID)
    assert float(p[1]) >= 0.5  # pushed up out of the ground
