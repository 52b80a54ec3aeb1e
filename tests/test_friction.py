"""Static vs dynamic friction split (``physics_material.rs:137-146``).

Scenario (VERDICT.md round-2 item 5): a box with high static / low dynamic
friction under a tilted gravity (equivalent to resting on a slope) must HOLD
from rest, but once given a push it must keep sliding (dynamic friction too
weak to stop it against the tangential gravity component).
"""

import jax.numpy as jnp
import pytest

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.pipeline.step import physics_step, rollout


def _slope_world(static_friction, dynamic_friction, push=0.0):
    b = SceneBuilder()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(
        ground, normal=(0, 1, 0),
        friction=dynamic_friction, static_friction=static_friction,
    )
    box = b.add_body(pos=(0.0, 0.5, 0.0))
    b.box(
        box, 0.5, 0.5, 0.5,
        friction=dynamic_friction, static_friction=static_friction,
    )
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    # Tilted gravity = slope with tan(theta) = 3.0/9.81 ~ 0.306:
    # static mu 0.6 holds; dynamic mu 0.1 cannot stop a moving box.
    w = w.replace(gravity=jnp.asarray([3.0, -9.81, 0.0], jnp.float32))
    if push:
        w = w.replace(
            bodies=w.bodies.replace(
                lin_vel=w.bodies.lin_vel.at[box, 0].set(push)
            )
        )
    return w, box


@pytest.fixture(scope="module")
def config():
    return PhysicsConfig(max_colors=4)


def test_static_friction_holds_at_rest(config):
    w, box = _slope_world(static_friction=0.6, dynamic_friction=0.1)
    w = rollout(w, config, 90)
    speed = float(jnp.linalg.norm(w.bodies.lin_vel[box]))
    assert speed < 0.05, f"box slid under static friction: speed={speed}"
    assert abs(float(w.bodies.pos[box][0])) < 0.1


def test_dynamic_friction_slides_when_pushed(config):
    w, box = _slope_world(static_friction=0.6, dynamic_friction=0.1, push=1.0)
    w = rollout(w, config, 60)
    vx = float(w.bodies.lin_vel[box][0])
    # Tangential gravity 3.0 m/s^2 vs dynamic friction decel ~0.98 m/s^2:
    # the box must have ACCELERATED past its initial push.
    assert vx > 1.5, f"box should keep accelerating while sliding: vx={vx}"


def test_uniform_friction_unchanged(config):
    # static == dynamic reproduces single-coefficient behavior: a strong
    # uniform coefficient stops the pushed box (no tangential gravity).
    b = SceneBuilder()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0, 1, 0), friction=0.8)
    box = b.add_body(pos=(0.0, 0.5, 0.0))
    b.box(box, 0.5, 0.5, 0.5, friction=0.8)
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    w = w.replace(
        bodies=w.bodies.replace(lin_vel=w.bodies.lin_vel.at[box, 0].set(2.0))
    )
    w = rollout(w, config, 90)
    assert float(jnp.linalg.norm(w.bodies.lin_vel[box])) < 0.05
