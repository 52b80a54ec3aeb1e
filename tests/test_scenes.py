"""Scene-level acceptance tests: pyramid stability, chain integrity,
CCD stress (the reference's bench/examples as behavioral specs)."""

import numpy as np
import jax.numpy as jnp

import jax

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step
from avian_tpu.pipeline.step import rollout

_ROLL60 = jax.jit(lambda w: rollout(w, CFG, 60))


def _run(world, steps):
    for _ in range((steps + 59) // 60):
        world = _ROLL60(world)
    return world
from avian_tpu.core.types import JointType
from avian_tpu.scenes import box_pyramid, ccd_stress, joint_chain

from conftest import TEST_SHAPE_PAIRS
CFG = PhysicsConfig(max_colors=4, shape_pairs=TEST_SHAPE_PAIRS)


def test_pyramid_2d_stable():
    world, ids = box_pyramid(base=6)
    world = _run(world, 240)
    pos = np.asarray(world.bodies.pos)[np.asarray(ids)]
    # Rows stay stacked: every box close to its initial grid position.
    assert np.all(np.isfinite(pos))
    # Top box sits near base*size height.
    top = pos[-1]
    assert abs(top[1] - 5.5) < 0.2, top
    assert abs(top[0]) < 0.25, top
    # Whole pyramid asleep by 4 seconds.
    assert bool(jnp.all(world.bodies.sleeping[jnp.asarray(ids)]))


def test_2d_bodies_stay_planar():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    boxes = []
    for k in range(3):
        body = b.add_body_2d(pos=(0.3 * (k % 2), 0.55 + 1.1 * k))
        b.box(body, 0.5, 0.5, 0.5)
        boxes.append(body)
    world = b.finalize(max_bodies=8, max_colliders=8, max_contacts=64)
    world = _run(world, 240)
    pos = np.asarray(world.bodies.pos)[np.asarray(boxes)]
    np.testing.assert_allclose(pos[:, 2], 0.0, atol=1e-5)  # locked Z
    quat = np.asarray(world.bodies.quat)[np.asarray(boxes)]
    np.testing.assert_allclose(quat[:, 0], 0.0, atol=1e-4)  # no X rotation
    np.testing.assert_allclose(quat[:, 1], 0.0, atol=1e-4)  # no Y rotation


def test_ccd_stress_speculative_no_tunneling():
    world, ids = ccd_stress(n_bullets=8, speed=80.0)
    cfg = PhysicsConfig(max_colors=4, shape_pairs=TEST_SHAPE_PAIRS)
    world = _run(world, 60)
    x = np.asarray(world.bodies.pos)[np.asarray(ids), 0]
    # Bullets started at x=0 moving at 80 m/s toward a thin wall at x=5;
    # speculative contacts must stop them at the wall (not pass through).
    assert np.all(x < 5.1), x
    assert np.all(np.isfinite(x))


def test_chain_hangs_connected():
    world, ids = joint_chain(n_links=8, jtype=JointType.SPHERICAL)
    world = _run(world, 240)
    pos = np.asarray(world.bodies.pos)
    gaps = np.linalg.norm(np.diff(pos[1:9], axis=0), axis=-1)
    np.testing.assert_allclose(gaps, 0.5, atol=0.05)


def test_swept_ccd_rewinds_fast_body():
    """Opt-in swept CCD (SweepMode::Linear): a very fast small bullet with
    a tiny speculative margin must be rewound at the wall by the sweep
    pass instead of tunneling (``ccd/mod.rs:523-687``)."""
    b = SceneBuilder()
    wall = b.add_body(body_type=BodyType.STATIC, pos=(5.0, 0.0, 0.0))
    b.box(wall, 0.05, 10.0, 10.0)
    bullet = b.add_body(
        pos=(0.0, 0.0, 0.0), lin_vel=(300.0, 0.0, 0.0), swept_ccd=True,
        gravity_scale=0.0,
    )
    # Tiny speculative margin: speculative CCD alone would tunnel.
    b.sphere(bullet, 0.1, speculative_margin=0.05)
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    cfg = PhysicsConfig(
        max_colors=4, swept_ccd=True, shape_pairs=TEST_SHAPE_PAIRS
    )
    for _ in range(10):
        world = physics_step(world, cfg)
    x = float(world.bodies.pos[bullet][0])
    assert x < 5.0, f"bullet tunneled: x={x}"


def test_swept_ccd_vs_swept_ccd():
    """Two swept-CCD bullets fired at each other must not pass through
    each other: the sweep evaluates pairs in relative motion, so
    CCD-vs-CCD pairs are visible (``ccd/mod.rs:523-687``)."""
    b = SceneBuilder()
    left = b.add_body(
        pos=(-4.0, 0.0, 0.0), lin_vel=(150.0, 0.0, 0.0), swept_ccd=True,
        gravity_scale=0.0,
    )
    b.sphere(left, 0.1, speculative_margin=0.05)
    right = b.add_body(
        pos=(4.0, 0.0, 0.0), lin_vel=(-150.0, 0.0, 0.0), swept_ccd=True,
        gravity_scale=0.0,
    )
    b.sphere(right, 0.1, speculative_margin=0.05)
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    cfg = PhysicsConfig(
        max_colors=4, swept_ccd=True, shape_pairs=TEST_SHAPE_PAIRS
    )
    for _ in range(12):
        world = physics_step(world, cfg)
    xl = float(world.bodies.pos[left][0])
    xr = float(world.bodies.pos[right][0])
    # Without CCD-vs-CCD each closes 2.5/step and they swap sides by
    # step 4; with it they meet near x=0 and never interpenetrate/cross.
    assert xl <= xr + 0.2, f"bullets crossed: left={xl:.2f} right={xr:.2f}"
    assert np.isfinite([xl, xr]).all()
