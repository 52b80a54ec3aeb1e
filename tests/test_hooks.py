"""Collision hooks tests (filter_pairs / modify_contacts) + conveyor."""

import numpy as np
import jax.numpy as jnp

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step

from conftest import TEST_SHAPE_PAIRS
CFG = PhysicsConfig(max_colors=4, shape_pairs=TEST_SHAPE_PAIRS)
CAPS = dict(max_bodies=8, max_colliders=8, max_contacts=64, max_joints=4)


class _DisableAll:
    def filter_pairs(self, world, ca, cb, valid):
        return valid & False


class _Conveyor:
    def modify_contacts(self, world, contacts):
        on_belt = (contacts.body_a == 0) | (contacts.body_b == 0)
        sign = jnp.where(contacts.body_a == 0, -1.0, 1.0)
        sv = jnp.where(
            on_belt[:, None],
            sign[:, None] * jnp.asarray([2.0, 0.0, 0.0]),
            contacts.surface_velocity,
        )
        return contacts.replace(surface_velocity=sv)


def test_filter_pairs_disables_collisions():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    ball = b.add_body(pos=(0, 1.0, 0))
    b.sphere(ball, 0.5)
    world = b.finalize(**CAPS)
    hooks = _DisableAll()
    for _ in range(60):
        world = physics_step(world, CFG, hooks=hooks)
    # With all pairs filtered, the ball falls through the ground.
    assert float(world.bodies.pos[ball][1]) < -1.0


def test_conveyor_surface_velocity():
    b = SceneBuilder()
    belt = b.add_body(body_type=BodyType.STATIC)
    b.box(belt, 5.0, 0.25, 2.0, friction=1.0)
    box = b.add_body(pos=(-2.0, 0.56, 0.0))
    b.box(box, 0.3, 0.3, 0.3, friction=1.0)
    world = b.finalize(**CAPS)
    hooks = _Conveyor()
    for _ in range(120):
        world = physics_step(world, CFG, hooks=hooks)
    # The box is dragged along +x by the belt.
    assert float(world.bodies.pos[box][0]) > -1.0
    assert float(world.bodies.lin_vel[box][0]) > 0.5
