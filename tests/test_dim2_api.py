"""2D API surface: forces, collision events (duck-typed on World2D),
checkpoint round-trip.

Reference counterparts: ``Forces`` accessor (``forces/query_data.rs``),
``CollisionStart``/``CollisionEnd`` (``collision_events.rs``), the
``serialize`` feature — on the ``avian2d`` profile.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avian_tpu.api import collisions
from avian_tpu.core.config import PhysicsConfig
from avian_tpu.core.types import BodyType
from avian_tpu.dim2 import SceneBuilder2D, physics_step_2d
from avian_tpu.dim2 import forces as forces2d


def _config():
    return PhysicsConfig(substeps=4, max_colors=4)


@pytest.fixture()
def free_ball():
    b = SceneBuilder2D()
    body = b.add_body(pos=(0.0, 10.0), gravity_scale=0.0)
    b.circle(body, 0.5)  # mass = pi * 0.25
    return b.finalize(), body


def test_apply_force_accelerates(free_ball):
    world, body = free_ball
    mass = 1.0 / float(world.bodies.inv_mass[body])
    world = forces2d.apply_force(world, body, (mass * 3.0, 0.0))
    world = physics_step_2d(world, _config())
    v = np.asarray(world.bodies.lin_vel[body])
    # One step of a = 3 m/s^2 at 60 Hz.
    assert v[0] == pytest.approx(3.0 / 60.0, rel=1e-4)
    # Accumulator cleared: next step adds nothing.
    world = physics_step_2d(world, _config())
    v2 = np.asarray(world.bodies.lin_vel[body])
    assert v2[0] == pytest.approx(v[0], rel=1e-5)


def test_apply_torque_and_constant_torque(free_ball):
    world, body = free_ball
    inertia = 1.0 / float(world.bodies.inv_inertia[body])
    world = forces2d.apply_torque(world, body, inertia * 2.0)
    world = physics_step_2d(world, _config())
    assert float(world.bodies.ang_vel[body]) == pytest.approx(
        2.0 / 60.0, rel=1e-4
    )

    world = forces2d.set_constant_torque(world, body, inertia * 2.0)
    w0 = float(world.bodies.ang_vel[body])
    world = physics_step_2d(world, _config())
    world = physics_step_2d(world, _config())
    assert float(world.bodies.ang_vel[body]) == pytest.approx(
        w0 + 2.0 * 2.0 / 60.0, rel=1e-3
    )


def test_impulses(free_ball):
    world, body = free_ball
    inv_m = float(world.bodies.inv_mass[body])
    world = forces2d.apply_linear_impulse(world, body, (2.0, 0.0))
    assert float(world.bodies.lin_vel[body][0]) == pytest.approx(
        2.0 * inv_m, rel=1e-5
    )
    inv_i = float(world.bodies.inv_inertia[body])
    world = forces2d.apply_angular_impulse(world, body, 3.0)
    assert float(world.bodies.ang_vel[body]) == pytest.approx(
        3.0 * inv_i, rel=1e-5
    )


def test_impulse_at_point_spins(free_ball):
    world, body = free_ball
    # Impulse +x applied above the center -> negative (clockwise) spin.
    world = forces2d.apply_impulse_at_point(
        world, body, (1.0, 0.0), (0.0, 10.5)
    )
    assert float(world.bodies.ang_vel[body]) < 0.0
    assert float(world.bodies.lin_vel[body][0]) > 0.0


def test_collision_events_on_world2d():
    """api/collisions works unchanged on World2D (same contact fields)."""
    b = SceneBuilder2D()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0.0, 1.0))
    ball = b.add_body(pos=(0.0, 0.6))
    b.circle(ball, 0.5)
    world = b.finalize()
    config = _config()

    started_step = None
    for i in range(30):
        world = physics_step_2d(world, config)
        if bool(jnp.any(collisions.started(world))):
            started_step = i
            break
    assert started_step is not None
    assert bool(collisions.contains(world, ground, ball))
    others = collisions.entities_colliding_with(world, ground, max_hits=4)
    assert ball in set(int(x) for x in others)

    # Teleport the ball far away -> CollisionEnd (possibly via eviction).
    world = world.replace(
        bodies=world.bodies.replace(
            pos=world.bodies.pos.at[ball].set(jnp.asarray([100.0, 50.0])),
            sleeping=world.bodies.sleeping.at[ball].set(False),
        )
    )
    ended_any = False
    for _ in range(3):
        world = physics_step_2d(world, config)
        ev = collisions.ended(world)
        mask, _, _, _ = collisions.ended_evicted(world)
        ended_any = ended_any or bool(jnp.any(ev)) or bool(jnp.any(mask))
    assert ended_any


def test_checkpoint_roundtrip_2d(tmp_path):
    from avian_tpu.utils import checkpoint

    b = SceneBuilder2D()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0.0, 1.0))
    for i in range(3):
        body = b.add_body(pos=(0.1 * i, 1.0 + 1.1 * i))
        b.box(body, 0.5, 0.5)
    world = b.finalize()
    config = _config()
    for _ in range(10):
        world = physics_step_2d(world, config)

    path = str(tmp_path / "w2d.npz")
    checkpoint.save(path, world)
    restored = checkpoint.load_2d(path)

    # Bit-exact state round-trip (incl. warm-start impulse caches).
    for got, want in zip(
        jax.tree.leaves(restored), jax.tree.leaves(world)
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # Continuation is bit-identical.
    a = physics_step_2d(world, config)
    c = physics_step_2d(restored, config)
    np.testing.assert_array_equal(
        np.asarray(a.bodies.pos), np.asarray(c.bodies.pos)
    )
    np.testing.assert_array_equal(
        np.asarray(a.contacts.normal_impulse),
        np.asarray(c.contacts.normal_impulse),
    )


def test_move_and_slide_2d():
    """2D character controller: slides along the floor, stops at a wall."""
    from avian_tpu.dim2 import character, queries

    b = SceneBuilder2D()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0.0, 1.0))
    wall = b.add_body(pos=(3.0, 2.0), body_type=BodyType.STATIC)
    b.box(wall, 0.5, 2.0)
    world = b.finalize()

    shape = queries.shape_capsule(0.4, 1.0)
    pos = jnp.asarray([0.0, 0.9])
    vel = jnp.asarray([2.0, -1.0])  # forward and into the ground

    move = jax.jit(
        lambda w, p, v: character.move_and_slide(w, shape, p, v, dt=1.0 / 10)
    )
    for _ in range(20):
        pos, out_vel, normal = move(world, pos, vel)

    pos_np = np.asarray(pos)
    # Stays above the ground (capsule bottom at -0.9 from center).
    assert pos_np[1] >= 0.9 - 0.02
    # Stopped by the wall (left face at x=2.5; capsule radius 0.4).
    assert pos_np[0] <= 2.5 - 0.4 + 0.02
    assert pos_np[0] > 1.5  # but actually travelled there


def test_swept_ccd_2d_rewinds_fast_body():
    """2D opt-in swept CCD: a fast bullet with a tiny speculative margin
    must be rewound at a thin wall instead of tunneling
    (``ccd/mod.rs:523-687`` on the avian2d profile)."""
    b = SceneBuilder2D()
    wall = b.add_body(body_type=BodyType.STATIC, pos=(5.0, 0.0))
    b.box(wall, 0.05, 10.0)
    bullet = b.add_body(
        pos=(0.0, 0.0), lin_vel=(300.0, 0.0), swept_ccd=True,
        gravity_scale=0.0,
    )
    b.circle(bullet, 0.1, speculative_margin=0.05)
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    cfg = PhysicsConfig(max_colors=4, swept_ccd=True)
    for _ in range(10):
        world = physics_step_2d(world, cfg)
    x = float(world.bodies.pos[bullet][0])
    assert x < 5.0, f"bullet tunneled: x={x}"


def test_swept_ccd_2d_vs_swept_ccd():
    """Two 2D swept-CCD bullets fired at each other must not cross."""
    b = SceneBuilder2D()
    left = b.add_body(
        pos=(-4.0, 0.0), lin_vel=(150.0, 0.0), swept_ccd=True,
        gravity_scale=0.0,
    )
    b.circle(left, 0.1, speculative_margin=0.05)
    right = b.add_body(
        pos=(4.0, 0.0), lin_vel=(-150.0, 0.0), swept_ccd=True,
        gravity_scale=0.0,
    )
    b.circle(right, 0.1, speculative_margin=0.05)
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    cfg = PhysicsConfig(max_colors=4, swept_ccd=True)
    for _ in range(12):
        world = physics_step_2d(world, cfg)
    xl = float(world.bodies.pos[left][0])
    xr = float(world.bodies.pos[right][0])
    assert xl <= xr + 0.2, f"bullets crossed: left={xl:.2f} right={xr:.2f}"
    assert np.isfinite([xl, xr]).all()


def test_interpolation_2d_and_picking_2d():
    """2D interpolation helpers + physics picking on World2D."""
    from avian_tpu.picking import pick_2d
    from avian_tpu.utils.interpolation import (
        extrapolate_poses_2d,
        hermite_interpolate_poses_2d,
        interpolate_poses_2d,
    )

    b = SceneBuilder2D()
    body = b.add_body(pos=(0.0, 2.0), lin_vel=(1.0, 0.0), gravity_scale=0.0)
    b.circle(body, 0.5)
    w0 = b.finalize()
    cfg = _config()
    w1 = physics_step_2d(w0, cfg)

    pos, angle = interpolate_poses_2d(w0.bodies, w1.bodies, 0.5)
    assert pos[body][0] == pytest.approx(0.5 / 60.0 / 2.0 * 2.0, abs=1e-3)
    # Endpoints are exact.
    p0, _ = interpolate_poses_2d(w0.bodies, w1.bodies, 0.0)
    np.testing.assert_allclose(
        np.asarray(p0), np.asarray(w0.bodies.pos), atol=1e-7
    )
    ph, ah = hermite_interpolate_poses_2d(w0.bodies, w1.bodies, 1.0, cfg.dt)
    np.testing.assert_allclose(
        np.asarray(ph), np.asarray(w1.bodies.pos), atol=1e-5
    )
    pe, _ = extrapolate_poses_2d(w1.bodies, cfg.dt)
    assert float(pe[body][0]) > float(w1.bodies.pos[body][0])

    hit = pick_2d(w0, (0.0, 5.0), (0.0, -1.0))
    assert bool(hit.hit) and int(hit.body) == body
    # Pickable mask excludes the only collider -> no pick.
    none = pick_2d(
        w0, (0.0, 5.0), (0.0, -1.0),
        pickable=jnp.zeros((w0.colliders.capacity,), bool),
    )
    assert not bool(none.hit)


def test_custom_constraint_2d_pendulum():
    """2D XpbdConstraint parity: a user center-distance constraint holds a
    pendulum at its rest length (``custom_constraint.rs`` on avian2d)."""
    from avian_tpu.dim2 import custom as cc2

    class CenterDistance2D:
        def __init__(self, body_a, body_b, rest):
            self.body_a, self.body_b, self.rest = body_a, body_b, rest

        def prepare(self, world, s, config):
            return {"cd": cc2.center_difference(world, self.body_a, self.body_b)}

        def solve(self, s, data, h):
            ba = jnp.asarray([self.body_a], jnp.int32)
            bb = jnp.asarray([self.body_b], jnp.int32)
            z = jnp.zeros((1, 2), jnp.float32)
            sep = cc2.current_separation(s, ba, bb, z, z, data["cd"][None, :])
            dist = jnp.linalg.norm(sep, axis=-1)
            dir_ = sep / jnp.maximum(dist, 1e-9)[..., None]
            corr = dir_ * (dist - self.rest)[..., None]
            s, _ = cc2.apply_positional_correction(
                s, ba, bb, z, z, corr, 0.0, h
            )
            return s, data

    b = SceneBuilder2D()
    anchor = b.add_body(body_type=BodyType.STATIC)
    b.box(anchor, 0.25, 0.25)
    bob = b.add_body(pos=(2.0, 0.0))
    b.box(bob, 0.25, 0.25)
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    con = CenterDistance2D(anchor, bob, 2.0)
    cfg = _config()
    for _ in range(120):
        world = physics_step_2d(world, cfg, custom_joints=con)
    pos = np.asarray(world.bodies.pos)
    assert np.isfinite(pos).all()
    d = float(np.linalg.norm(pos[bob] - pos[anchor]))
    assert abs(d - 2.0) < 0.05, f"distance drifted: {d}"
    assert pos[bob][1] < -0.5  # swung down
