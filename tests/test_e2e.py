"""End-to-end scenario tests (headless manually-stepped scenes, mirroring
the reference's ``src/tests/mod.rs`` harness style).

All scenarios share the same world capacities and PhysicsConfig so the jitted
step compiles once per pytest process.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avian_tpu import (
    BodyType,
    PhysicsConfig,
    SceneBuilder,
    physics_step,
)
from avian_tpu.core.types import JointType

# Shared shapes => one compile for every test in this module.
# max_colors=4 keeps the unrolled color loop small for these <=8-body
# scenes (degree <= 3), cutting CPU compile time ~3x vs the production
# default; behavior is identical when nothing overflows.
CAPS = dict(max_bodies=8, max_colliders=8, max_contacts=64, max_joints=4)
from conftest import TEST_SHAPE_PAIRS
CFG = PhysicsConfig(max_colors=4, shape_pairs=TEST_SHAPE_PAIRS)

_N_ROLL = {}


def run(world, steps):
    """Drive `steps` steps as chunks of one compiled 60-step rollout (a
    single program serves every test length; steps rounds up to 60s)."""
    from avian_tpu.pipeline.step import rollout

    fn = _N_ROLL.setdefault(
        60, jax.jit(lambda w: rollout(w, CFG, 60))
    )
    for _ in range((steps + 59) // 60):
        world = fn(world)
    return world


def test_ball_falls_bounces_and_sleeps():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    ball = b.add_body(pos=(0, 5.0, 0))
    b.sphere(ball, 0.5, restitution=0.5)
    world = run(b.finalize(**CAPS), 300)
    pos = np.asarray(world.bodies.pos[ball])
    assert abs(pos[1] - 0.5) < 2e-3, pos
    assert bool(world.bodies.sleeping[ball])
    assert float(np.linalg.norm(np.asarray(world.bodies.lin_vel[ball]))) < 1e-6


def test_restitution_bounce_height():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    # Restitution on both surfaces: the default AVERAGE combine rule
    # (physics_material.rs:13-46) would otherwise halve it.
    b.half_space(g, normal=(0, 1, 0), restitution=0.8)
    ball = b.add_body(pos=(0, 2.0, 0))
    b.sphere(ball, 0.5, restitution=0.8)
    world = b.finalize(**CAPS)
    # Step until first bounce, then track apex.
    apex = 0.0
    bounced = False
    for _ in range(240):
        world = physics_step(world, CFG)
        y = float(world.bodies.pos[ball][1])
        vy = float(world.bodies.lin_vel[ball][1])
        if vy > 0.1:
            bounced = True
        if bounced:
            apex = max(apex, y)
    # Drop height 1.5 above rest; e=0.8 -> energy ratio 0.64 -> apex ~0.96+0.5.
    assert bounced
    assert 0.5 + 0.64 * 1.5 * 0.7 < apex < 0.5 + 0.64 * 1.5 * 1.15, apex


def test_box_stack_stable():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    ids = []
    for k in range(3):
        body = b.add_body(pos=(0, 0.5 + 1.0 * k + 0.001 * k, 0))
        b.box(body, 0.5, 0.5, 0.5)
        ids.append(body)
    world = run(b.finalize(**CAPS), 240)
    for k, body in enumerate(ids):
        pos = np.asarray(world.bodies.pos[body])
        assert abs(pos[0]) < 0.02 and abs(pos[2]) < 0.02, (k, pos)
        assert abs(pos[1] - (0.5 + k)) < 0.02, (k, pos)
    # Stack asleep by 4 seconds.
    assert bool(jnp.all(world.bodies.sleeping[jnp.asarray(ids)]))


def test_friction_holds_box_on_slope():
    # 20 deg slope; mu=0.5 > tan(20)=0.36 holds, mu=0.05 slides.
    import math

    angle = math.radians(20)
    q = (0.0, 0.0, math.sin(angle / 2), math.cos(angle / 2))

    def make(mu):
        b = SceneBuilder()
        g = b.add_body(body_type=BodyType.STATIC, quat=q)
        b.half_space(g, normal=(0, 1, 0), friction=mu)
        box = b.add_body(pos=(0, 0.6, 0), quat=q)
        b.box(box, 0.5, 0.5, 0.5, friction=mu)
        return b.finalize(**CAPS), box

    world, box = make(0.5)
    x0 = float(world.bodies.pos[box][0])
    world = run(world, 120)
    assert abs(float(world.bodies.pos[box][0]) - x0) < 0.05

    world, box = make(0.05)
    world = run(world, 120)
    assert abs(float(world.bodies.pos[box][0]) - x0) > 0.5


def test_kinematic_platform_carries_velocity():
    b = SceneBuilder()
    plat = b.add_body(body_type=BodyType.KINEMATIC, pos=(0, 0, 0), lin_vel=(0, 0, 0))
    b.box(plat, 2.0, 0.25, 2.0)
    box = b.add_body(pos=(0, 0.8, 0))
    b.box(box, 0.25, 0.25, 0.25)
    world = run(b.finalize(**CAPS), 120)
    # Kinematic platform must not fall; box rests on it.
    assert abs(float(world.bodies.pos[plat][1])) < 1e-6
    assert abs(float(world.bodies.pos[box][1]) - 0.5) < 0.01


def test_distance_joint_pendulum():
    b = SceneBuilder()
    anchor = b.add_body(body_type=BodyType.STATIC, pos=(0, 2, 0))
    bob = b.add_body(pos=(1.0, 2.0, 0.0))
    b.sphere(bob, 0.1)
    b.add_joint(
        JointType.DISTANCE, anchor, bob,
        anchor_a=(0, 0, 0), anchor_b=(0, 0, 0),
        limit_min=1.0, limit_max=1.0,
    )
    world = run(b.finalize(**CAPS), 120)
    p = np.asarray(world.bodies.pos[bob])
    dist = np.linalg.norm(p - np.array([0, 2, 0]))
    assert abs(dist - 1.0) < 0.02, (p, dist)
    # It should have swung down.
    assert p[1] < 1.9


def test_revolute_joint_hinge():
    b = SceneBuilder()
    base = b.add_body(body_type=BodyType.STATIC, pos=(0, 2, 0))
    arm = b.add_body(pos=(1.0, 2.0, 0.0))
    b.box(arm, 0.5, 0.1, 0.1)
    b.revolute_joint(
        base, arm, axis=(0, 0, 1),
        anchor_a=(0, 0, 0), anchor_b=(-1.0, 0, 0),
    )
    world = run(b.finalize(**CAPS), 180)
    p = np.asarray(world.bodies.pos[arm])
    # Anchor point stays at the base; arm swings about Z in the XY plane.
    np.testing.assert_allclose(p[2], 0.0, atol=0.02)
    dist = np.linalg.norm(p - np.array([0, 2, 0]))
    np.testing.assert_allclose(dist, 1.0, atol=0.05)
    # Swung below the pivot.
    assert p[1] < 1.8


def test_fixed_joint_rigid_link():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC, pos=(0, 3, 0))
    child = b.add_body(pos=(0.0, 2.0, 0.0))
    b.box(child, 0.2, 0.2, 0.2)
    b.add_joint(
        JointType.FIXED, g, child, anchor_a=(0, -1, 0), anchor_b=(0, 0, 0)
    )
    world = run(b.finalize(**CAPS), 120)
    p = np.asarray(world.bodies.pos[child])
    np.testing.assert_allclose(p, [0, 2, 0], atol=0.03)
    q = np.asarray(world.bodies.quat[child])
    assert abs(abs(q[3]) - 1.0) < 1e-2  # orientation locked


def test_sensor_does_not_collide():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    zone_body = b.add_body(body_type=BodyType.STATIC, pos=(0, 1.0, 0))
    b.box(zone_body, 1.0, 1.0, 1.0, is_sensor=True)
    ball = b.add_body(pos=(0, 3.0, 0))
    b.sphere(ball, 0.5)
    world = run(b.finalize(**CAPS), 200)
    # Ball falls through the sensor and rests on the ground.
    assert abs(float(world.bodies.pos[ball][1]) - 0.5) < 0.01
    # Sensor pair reported as touching at some point: check contact flags now
    # (ball rests inside? no - rests below the zone) -> just check it fell.


def test_collision_layers_filtering():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0), layer_members=0b01, layer_filter=0b01)
    ball = b.add_body(pos=(0, 2.0, 0))
    # Ball on layer 2 that only collides with layer 2: falls through.
    b.sphere(ball, 0.5, layer_members=0b10, layer_filter=0b10)
    world = run(b.finalize(**CAPS), 120)
    assert float(world.bodies.pos[ball][1]) < -1.0


def test_determinism_bitwise():
    def build():
        b = SceneBuilder()
        g = b.add_body(body_type=BodyType.STATIC)
        b.half_space(g, normal=(0, 1, 0))
        for k in range(4):
            body = b.add_body(pos=(0.01 * k, 0.6 + 1.05 * k, 0.005 * k))
            b.box(body, 0.5, 0.5, 0.5, restitution=0.1)
        return b.finalize(**CAPS)

    w1 = run(build(), 120)
    w2 = run(build(), 120)
    np.testing.assert_array_equal(
        np.asarray(w1.bodies.pos), np.asarray(w2.bodies.pos)
    )
    np.testing.assert_array_equal(
        np.asarray(w1.bodies.quat), np.asarray(w2.bodies.quat)
    )


def test_vmap_batch_of_scenes():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    ball = b.add_body(pos=(0, 2.0, 0))
    b.sphere(ball, 0.5)
    world = b.finalize(**CAPS)

    batch = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (4,) + x.shape).copy(), world
    )
    # Vary initial heights per scene.
    heights = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    batch = batch.replace(
        bodies=batch.bodies.replace(
            pos=batch.bodies.pos.at[:, ball, 1].set(heights)
        )
    )
    step_b = jax.jit(
        jax.vmap(lambda w: physics_step(w, CFG))
    )
    for _ in range(240):
        batch = step_b(batch)
    ys = np.asarray(batch.bodies.pos[:, ball, 1])
    np.testing.assert_allclose(ys, 0.5, atol=5e-3)
