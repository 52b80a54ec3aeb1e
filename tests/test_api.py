"""Forces / control / collisions-API / checkpoint tests."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step
from avian_tpu.api import collisions, control, forces
from avian_tpu.utils import checkpoint

from conftest import TEST_SHAPE_PAIRS
CFG = PhysicsConfig(max_colors=4, shape_pairs=TEST_SHAPE_PAIRS)
CAPS = dict(max_bodies=8, max_colliders=8, max_contacts=64, max_joints=4)


def _ground_ball(h=2.0, restitution=0.0):
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    ball = b.add_body(pos=(0, h, 0))
    b.sphere(ball, 0.5, restitution=restitution)
    return b.finalize(**CAPS), ball


def test_apply_force_accelerates():
    b = SceneBuilder()
    body = b.add_body(mass=2.0, inertia=(1, 1, 1), gravity_scale=0.0)
    world = b.finalize(**CAPS)
    world = forces.apply_force(world, body, (2.0, 0, 0))
    world = physics_step(world, CFG)
    # F/m * dt = 1.0 * dt
    np.testing.assert_allclose(
        float(world.bodies.lin_vel[body][0]), CFG.dt, rtol=1e-4
    )
    # Force is cleared after the step.
    world = physics_step(world, CFG)
    np.testing.assert_allclose(
        float(world.bodies.lin_vel[body][0]), CFG.dt, rtol=1e-4
    )


def test_apply_impulse_and_at_point():
    b = SceneBuilder()
    body = b.add_body(mass=2.0, inertia=(1, 1, 1), gravity_scale=0.0)
    world = b.finalize(**CAPS)
    world = forces.apply_linear_impulse(world, body, (4.0, 0, 0))
    np.testing.assert_allclose(
        np.asarray(world.bodies.lin_vel[body]), [2, 0, 0], rtol=1e-5
    )
    world = forces.apply_impulse_at_point(world, body, (0, 0, 1.0), (1.0, 0, 0))
    # Torque = r x J = (1,0,0) x (0,0,1) = (0,-1,0); w = I^-1 T = (0,-1,0).
    np.testing.assert_allclose(
        np.asarray(world.bodies.ang_vel[body]), [0, -1, 0], atol=1e-5
    )


def test_constant_force_persists():
    b = SceneBuilder()
    body = b.add_body(mass=1.0, inertia=(1, 1, 1), gravity_scale=0.0)
    world = b.finalize(**CAPS)
    world = forces.set_constant_force(world, body, (1.0, 0, 0))
    for _ in range(60):
        world = physics_step(world, CFG)
    np.testing.assert_allclose(
        float(world.bodies.lin_vel[body][0]), 1.0, rtol=1e-3
    )


def test_sleep_wake_and_gravity_change():
    world, ball = _ground_ball()
    for _ in range(200):
        world = physics_step(world, CFG)
    assert bool(world.bodies.sleeping[ball])
    world = control.set_gravity(world, (0.0, 9.81, 0.0))  # flip gravity, wake
    assert not bool(world.bodies.sleeping[ball])
    for _ in range(30):
        world = physics_step(world, CFG)
    assert float(world.bodies.pos[ball][1]) > 1.0  # flew up


def test_collision_api():
    world, ball = _ground_ball(h=0.45)  # start slightly penetrating
    world = physics_step(world, CFG)
    assert bool(collisions.contains(world, 0, ball))
    slot = int(collisions.get(world, 0, ball))
    assert slot >= 0
    others = np.asarray(collisions.entities_colliding_with(world, ball))
    assert 0 in others
    # started() fires on the first touching step.
    world2, ball2 = _ground_ball(h=0.45)
    w = physics_step(world2, CFG)
    assert bool(jnp.any(collisions.started(w)))
    w = physics_step(w, CFG)
    assert not bool(jnp.any(collisions.started(w)))


def test_collision_end_on_eviction():
    """Fast separation: the pair leaves the contact buffer entirely and
    must still fire CollisionEnd exactly once with its stable contact id
    (``collision_events.rs:256``; VERDICT round-2 item 6)."""
    b = SceneBuilder()
    a1 = b.add_body(pos=(0.0, 0.0, 0.0), gravity_scale=0.0)
    b.sphere(a1, 0.5)
    a2 = b.add_body(pos=(0.9, 0.0, 0.0), gravity_scale=0.0)
    b.sphere(a2, 0.5)
    world = b.finalize(**CAPS)
    world = physics_step(world, CFG)
    assert bool(collisions.contains(world, a1, a2))
    slot = int(collisions.get(world, a1, a2))
    cid = int(world.contacts.contact_id[slot])
    assert cid > 0
    # Fling them apart so fast the AABBs no longer overlap next step.
    world = world.replace(
        bodies=world.bodies.replace(
            lin_vel=world.bodies.lin_vel.at[a1].set(
                jnp.asarray([-60.0, 0, 0])
            ).at[a2].set(jnp.asarray([60.0, 0, 0]))
        )
    )
    # The eviction fires in the step whose broadphase no longer emits the
    # pair (one step after separation starts); exactly once overall.
    total = 0
    for _ in range(4):
        world = physics_step(world, CFG)
        mask, ids, ba, bb = collisions.ended_evicted(world)
        mask = np.asarray(mask)
        if mask.sum():
            i = int(np.argmax(mask))
            assert int(np.asarray(ids)[i]) == cid
            assert {int(np.asarray(ba)[i]), int(np.asarray(bb)[i])} == {
                a1, a2,
            }
        total += int(mask.sum())
    assert total == 1, f"expected exactly one eviction, got {total}"


def test_checkpoint_roundtrip_bitwise():
    world, ball = _ground_ball()
    for _ in range(30):
        world = physics_step(world, CFG)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt.npz")
        checkpoint.save(path, world)
        restored = checkpoint.load(path)
    # Continue both and compare bitwise (warm-start caches round-trip).
    a = physics_step(world, CFG)
    b2 = physics_step(restored, CFG)
    np.testing.assert_array_equal(
        np.asarray(a.bodies.pos), np.asarray(b2.bodies.pos)
    )
    np.testing.assert_array_equal(
        np.asarray(a.contacts.normal_impulse), np.asarray(b2.contacts.normal_impulse)
    )


def test_teleport_and_disable():
    world, ball = _ground_ball()
    world = control.set_position(world, ball, (5.0, 3.0, 0.0))
    np.testing.assert_allclose(np.asarray(world.bodies.pos[ball]), [5, 3, 0])
    world = control.disable_body(world, ball)
    w2 = physics_step(world, CFG)
    # Disabled body doesn't move.
    np.testing.assert_allclose(np.asarray(w2.bodies.pos[ball]), [5, 3, 0])
    world = control.enable_body(world, ball)
    w3 = physics_step(world, CFG)
    assert float(w3.bodies.pos[ball][1]) < 3.0


def test_stable_contact_ids_persist_across_reslotting():
    """A pair's contact id stays fixed while it persists, even as buffer
    slots re-shuffle (reference stable ContactEdge ids)."""
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    a1 = b.add_body(pos=(0, 0.49, 0))
    b.sphere(a1, 0.5)
    a2 = b.add_body(pos=(5, 2.0, 0))   # lands later -> new id later
    b.sphere(a2, 0.5)
    world = b.finalize(**CAPS)

    def id_of(world, body):
        c = world.contacts
        m = np.asarray(c.active & c.touching) & (
            (np.asarray(c.body_a) == body) | (np.asarray(c.body_b) == body)
        )
        ids = np.asarray(c.contact_id)[m]
        return set(int(i) for i in ids)

    import numpy as np

    for _ in range(5):
        world = physics_step(world, CFG)
    first = id_of(world, a1)
    assert len(first) == 1 and 0 not in first
    for _ in range(30):
        world = physics_step(world, CFG)
    # a2 has landed by now: new distinct id; a1's id unchanged.
    assert id_of(world, a1) == first
    second = id_of(world, a2)
    assert len(second) == 1 and second != first


def test_direct_velocity_write_wakes_island():
    """Writing bodies.lin_vel directly (bypassing the Forces API) wakes
    the sleeping island on the next step (reference change-detection wake,
    islands/sleeping.rs:558-606)."""
    import numpy as np

    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    lower = b.add_body(pos=(0, 0.49, 0))
    b.box(lower, 0.5, 0.5, 0.5)
    upper = b.add_body(pos=(0, 1.51, 0))
    b.box(upper, 0.5, 0.5, 0.5)
    world = b.finalize(**CAPS)
    for _ in range(60):
        world = physics_step(world, CFG)
    assert bool(world.bodies.sleeping[lower]) and bool(
        world.bodies.sleeping[upper]
    )
    # Direct write: no API call, no explicit wake.
    world = world.replace(
        bodies=world.bodies.replace(
            lin_vel=world.bodies.lin_vel.at[upper, 0].set(1.0)
        )
    )
    world = physics_step(world, CFG)
    assert not bool(world.bodies.sleeping[upper])
    assert not bool(world.bodies.sleeping[lower])  # same island wakes


def test_direct_position_write_wakes_island():
    """Teleporting a sleeping body by writing bodies.pos directly (no
    set_position call) wakes it and its island: sleeping bodies are never
    integrated, so a pose differing from the engine's end-of-step
    snapshot must be a user write (islands/sleeping.rs:558-606)."""
    import numpy as np

    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    lower = b.add_body(pos=(0, 0.49, 0))
    b.box(lower, 0.5, 0.5, 0.5)
    upper = b.add_body(pos=(0, 1.51, 0))
    b.box(upper, 0.5, 0.5, 0.5)
    world = b.finalize(**CAPS)
    for _ in range(60):
        world = physics_step(world, CFG)
    assert bool(world.bodies.sleeping[upper])
    # Raw pytree teleport: lift the upper box into the air.
    world = world.replace(
        bodies=world.bodies.replace(
            pos=world.bodies.pos.at[upper, 1].set(3.0)
        )
    )
    world = physics_step(world, CFG)
    world = physics_step(world, CFG)
    assert not bool(world.bodies.sleeping[upper])
    assert not bool(world.bodies.sleeping[lower])  # island woke too
    # And the woken body actually falls again.
    y0 = float(world.bodies.pos[upper, 1])
    for _ in range(30):
        world = physics_step(world, CFG)
    assert float(world.bodies.pos[upper, 1]) < y0 - 0.05


def test_collider_recipes():
    """Data-driven spawn path (ColliderConstructor, constructor.rs:312)."""
    import numpy as np
    from avian_tpu.core.constructor import spawn, spawn_hierarchy

    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    spawn(b, g, {"kind": "half_space", "normal": (0, 1, 0)})
    body = b.add_body(pos=(0, 2.0, 0))
    ids = spawn_hierarchy(
        b, body,
        [
            {"kind": "sphere", "radius": 0.5},
            ({"kind": "box", "half_x": 0.2, "half_y": 0.2, "half_z": 0.2},
             (0.0, 0.7, 0.0), (0, 0, 0, 1)),
        ],
    )
    assert len(ids) == 2
    terrain = b.add_body(body_type=BodyType.STATIC, pos=(10, 0, 0))
    tri_ids = spawn(
        b, terrain,
        {"kind": "heightfield", "heights": np.zeros((3, 3)),
         "x_extent": 4.0, "z_extent": 4.0},
    )
    assert len(tri_ids) == 8
    world = b.finalize(max_bodies=4, max_colliders=16, max_contacts=64)
    world = physics_step(world, CFG)
    import jax.numpy as jnp
    assert bool(jnp.all(jnp.isfinite(world.bodies.pos)))
