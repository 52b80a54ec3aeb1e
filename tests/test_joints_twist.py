"""Spherical twist limit: clamps rotation about the primary axis
(``xpbd/joints/spherical.rs:20-38,76-80``)."""

import numpy as np
import jax

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder
from avian_tpu.core.types import JointType
from avian_tpu.pipeline.step import rollout

CFG = PhysicsConfig(max_colors=4, shape_pairs=((0, 0),))


def _twist_world(twist_enabled):
    b = SceneBuilder()
    b.gravity = (0.0, 0.0, 0.0)
    anchor = b.add_body(body_type=BodyType.STATIC, pos=(0, 0, 0))
    # Spinning body attached by a spherical joint, spinning about Z
    # (= the joint's primary axis with identity bases).
    spin = b.add_body(pos=(0, 0, 1.0), ang_vel=(0, 0, 4.0))
    b.sphere(spin, 0.5)
    b.add_joint(
        JointType.SPHERICAL, anchor, spin,
        anchor_a=(0, 0, 1.0), anchor_b=(0, 0, 0),
        twist_min=-0.5, twist_max=0.5, twist_enabled=twist_enabled,
    )
    return b.finalize(max_bodies=4, max_colliders=4, max_contacts=16,
                      max_joints=4), spin


def _twist_angle(quat):
    # Rotation about Z of a quaternion (twist part about z).
    x, y, z, w = quat
    return 2.0 * np.arctan2(z, w)


def test_twist_limit_clamps_rotation():
    world, spin = _twist_world(True)
    world = jax.jit(lambda w: rollout(w, CFG, 60))(world)
    q = np.asarray(world.bodies.quat[spin])
    angle = _twist_angle(q)
    # 4 rad/s * 1 s = 4 rad unclamped; the +-0.5 limit must hold (with a
    # little softness slack).
    assert abs(angle) < 0.7, angle
    # Spin velocity about z killed by the limit.
    assert abs(float(world.bodies.ang_vel[spin][2])) < 0.5


def test_without_twist_limit_spins_freely():
    world, spin = _twist_world(False)
    world = jax.jit(lambda w: rollout(w, CFG, 60))(world)
    assert abs(float(world.bodies.ang_vel[spin][2]) - 4.0) < 0.2
