"""2D solver behaviors: static/dynamic friction split, conveyor surface
speed, locked axes — the avian2d profile of the corresponding 3D tests
(``physics_material.rs:137-146``, conveyor hooks, ``locked_axes.rs``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from avian_tpu import BodyType, PhysicsConfig
from avian_tpu.dim2 import SceneBuilder2D, physics_step_2d
from avian_tpu.dim2.state import LOCK_ROT


CFG = PhysicsConfig(max_colors=4)


def _slope_world(static_friction, dynamic_friction, push=0.0):
    b = SceneBuilder2D()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(
        ground, normal=(0, 1),
        friction=dynamic_friction, static_friction=static_friction,
    )
    box = b.add_body(pos=(0.0, 0.5))
    b.box(
        box, 0.5, 0.5,
        friction=dynamic_friction, static_friction=static_friction,
    )
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    # Tilted gravity = slope with tan(theta) = 3/9.81 ~ 0.306: static mu
    # 0.6 holds from rest; dynamic mu 0.1 can't stop a moving box.
    w = w.replace(gravity=jnp.asarray([3.0, -9.81], jnp.float32))
    if push:
        w = w.replace(
            bodies=w.bodies.replace(
                lin_vel=w.bodies.lin_vel.at[box, 0].set(push)
            )
        )
    return w, box


def test_2d_static_friction_holds_at_rest():
    w, box = _slope_world(0.6, 0.1)
    for _ in range(90):
        w = physics_step_2d(w, CFG)
    assert abs(float(w.bodies.lin_vel[box][0])) < 0.05
    assert abs(float(w.bodies.pos[box][0])) < 0.1


def test_2d_dynamic_friction_slides_when_pushed():
    w, box = _slope_world(0.6, 0.1, push=1.0)
    for _ in range(90):
        w = physics_step_2d(w, CFG)
    # Dynamic friction (0.1) can't cancel the tangential gravity (0.306 g):
    # the box keeps accelerating downslope.
    assert float(w.bodies.lin_vel[box][0]) > 1.0
    assert float(w.bodies.pos[box][0]) > 1.0


def test_2d_conveyor_surface_speed():
    """A hook writing ``surface_speed`` drives resting boxes along the
    belt (the conveyor_belt example's mechanism on the 2D profile)."""

    class BeltHooks:
        def modify_contacts(self, world, contacts):
            on_belt = (contacts.body_a == 0) | (contacts.body_b == 0)
            sv = jnp.where(on_belt, 2.0, contacts.surface_speed)
            return contacts.replace(surface_speed=sv)

    hooks = BeltHooks()
    b = SceneBuilder2D()
    belt = b.add_body(body_type=BodyType.STATIC)
    b.box(belt, 5.0, 0.25, friction=1.0)
    box = b.add_body(pos=(0.0, 0.8))
    b.box(box, 0.25, 0.25, friction=1.0)
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)

    xs = []
    for _ in range(120):
        w = physics_step_2d(w, CFG, hooks=hooks)
        xs.append(float(w.bodies.pos[box][0]))
    # The box is carried along the belt: significant, consistent motion.
    assert abs(xs[-1]) > 0.5, f"box not carried: x={xs[-1]}"
    assert abs(float(w.bodies.lin_vel[box][0])) > 0.5
    # Monotone drift direction over the second half (steady conveying).
    half = np.asarray(xs[60:])
    assert (np.diff(half) * np.sign(half[-1] - half[0]) >= -1e-4).all()


def test_2d_locked_rotation():
    """LOCK_ROT: an off-center landing can't spin the body."""
    b = SceneBuilder2D()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0, 1))
    box = b.add_body(pos=(0.0, 1.5), angle=0.3, locked_axes=LOCK_ROT)
    b.box(box, 0.5, 0.5)
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    for _ in range(120):
        w = physics_step_2d(w, CFG)
    assert float(w.bodies.angle[box]) == pytest.approx(0.3, abs=1e-5)
    assert abs(float(w.bodies.ang_vel[box])) < 1e-5
    assert np.isfinite(np.asarray(w.bodies.pos)).all()


def test_2d_control_api():
    """api.control works on World2D (sleep/wake/teleport/gravity)."""
    from avian_tpu.api import control

    b = SceneBuilder2D()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0, 1))
    box = b.add_body(pos=(0.0, 0.51))
    b.box(box, 0.5, 0.5)
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)

    w = control.sleep_body(w, box)
    assert bool(w.bodies.sleeping[box])
    w = control.wake_body(w, box)
    assert not bool(w.bodies.sleeping[box])

    w = control.set_position(w, box, (2.0, 0.51), angle=0.2)
    assert float(w.bodies.pos[box][0]) == pytest.approx(2.0)
    assert float(w.bodies.angle[box]) == pytest.approx(0.2)

    w = control.set_velocity(w, box, lin_vel=(1.0, 0.0), ang_vel=0.5)
    assert float(w.bodies.ang_vel[box]) == pytest.approx(0.5)

    w = control.set_gravity(w, (0.0, -5.0))
    assert float(w.gravity[1]) == pytest.approx(-5.0)
    w = control.disable_body(w, box)
    assert not bool(w.bodies.active[box])
    w = control.enable_body(w, box)
    assert bool(w.bodies.active[box])
    # Still steps cleanly afterwards.
    w = physics_step_2d(w, CFG)
    assert np.isfinite(np.asarray(w.bodies.pos)).all()
