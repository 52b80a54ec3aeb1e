"""User constraint extension point (``XpbdConstraint`` parity,
``xpbd/mod.rs:23-52``; VERDICT round-2 item 3)."""

import jax.numpy as jnp
import numpy as np

from avian_tpu import BodyType, JointType, PhysicsConfig, SceneBuilder, physics_step
from avian_tpu.api import custom as cc

from conftest import TEST_SHAPE_PAIRS

CFG = PhysicsConfig(max_colors=4, shape_pairs=TEST_SHAPE_PAIRS)


class CenterDistance:
    """Keeps |com_b - com_a| at ``rest`` (the reference example)."""

    def __init__(self, body_a, body_b, rest, compliance=0.0):
        self.body_a, self.body_b = body_a, body_b
        self.rest, self.compliance = rest, compliance

    def prepare(self, world, s, config):
        return {
            "cd": cc.center_difference(world, self.body_a, self.body_b),
            "lagrange": jnp.zeros((), jnp.float32),
        }

    def solve(self, s, data, h):
        ba = jnp.asarray([self.body_a], jnp.int32)
        bb = jnp.asarray([self.body_b], jnp.int32)
        z = jnp.zeros((1, 3), jnp.float32)
        sep = cc.current_separation(s, ba, bb, z, z, data["cd"][None, :])
        dist = jnp.linalg.norm(sep, axis=-1)
        dir_ = sep / jnp.maximum(dist, 1e-9)[..., None]
        corr = dir_ * (dist - self.rest)[..., None]
        s, dl = cc.apply_positional_correction(
            s, ba, bb, z, z, corr, self.compliance, h
        )
        return s, {"cd": data["cd"], "lagrange": data["lagrange"] + dl[0]}


class AlignOrientation:
    """Aligns two bodies' primary (local Y) axes via the angular helper."""

    def __init__(self, body_a, body_b):
        self.body_a, self.body_b = body_a, body_b

    def prepare(self, world, s, config):
        from avian_tpu.math import quat as quat_m

        y = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
        return {
            "axis_a": quat_m.rotate(world.bodies.quat[self.body_a], y),
            "axis_b": quat_m.rotate(world.bodies.quat[self.body_b], y),
        }

    def solve(self, s, data, h):
        from avian_tpu.math import quat as quat_m

        ba = jnp.asarray([self.body_a], jnp.int32)
        bb = jnp.asarray([self.body_b], jnp.int32)
        a1 = quat_m.rotate(s.delta_quat[ba], data["axis_a"][None, :])
        a2 = quat_m.rotate(s.delta_quat[bb], data["axis_b"][None, :])
        s, _ = cc.apply_angular_correction(
            s, ba, bb, jnp.cross(a1, a2), 0.0, h
        )
        return s, data


def test_center_distance_pendulum():
    b = SceneBuilder()
    anchor = b.add_body(body_type=BodyType.STATIC)
    b.box(anchor, 0.25, 0.25, 0.25)
    cube = b.add_body(pos=(2.0, 0.0, 0.0))
    b.box(cube, 0.25, 0.25, 0.25)
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    con = CenterDistance(anchor, cube, 2.0)
    for _ in range(120):
        world = physics_step(world, CFG, custom_joints=con)
    pos = np.asarray(world.bodies.pos)
    assert np.isfinite(pos).all()
    d = float(np.linalg.norm(pos[cube] - pos[anchor]))
    assert abs(d - 2.0) < 0.05, f"distance drifted: {d}"
    assert pos[cube][1] < -0.5  # swung down


def test_custom_alongside_builtin_joints():
    """The custom solve runs in the same position window as built-in
    joints and shares their velocity projection."""
    b = SceneBuilder()
    anchor = b.add_body(body_type=BodyType.STATIC)
    mid = b.add_body(pos=(1.0, 0.0, 0.0))
    b.sphere(mid, 0.2)
    tip = b.add_body(pos=(2.0, 0.0, 0.0))
    b.sphere(tip, 0.2)
    # Built-in spherical joint anchor->mid; custom distance mid->tip.
    b.add_joint(
        JointType.SPHERICAL, anchor, mid,
        anchor_a=(0.5, 0, 0), anchor_b=(-0.5, 0, 0),
    )
    world = b.finalize(
        max_bodies=4, max_colliders=4, max_contacts=16, max_joints=2
    )
    con = CenterDistance(mid, tip, 1.0)
    for _ in range(90):
        world = physics_step(world, CFG, custom_joints=con)
    pos = np.asarray(world.bodies.pos)
    assert np.isfinite(pos).all()
    d = float(np.linalg.norm(pos[tip] - pos[mid]))
    assert abs(d - 1.0) < 0.08, f"custom distance drifted: {d}"


def test_angular_align_custom():
    import math

    b = SceneBuilder()
    a1 = b.add_body(gravity_scale=0.0, mass=1.0, inertia=(1, 1, 1))
    half = math.sin(0.4 / 2)
    a2 = b.add_body(
        pos=(3.0, 0, 0), gravity_scale=0.0, mass=1.0, inertia=(1, 1, 1),
        quat=(0.0, 0.0, half, math.cos(0.4 / 2)),
    )
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    con = AlignOrientation(a1, a2)
    for _ in range(90):
        world = physics_step(world, CFG, custom_joints=con)
    from avian_tpu.math import quat as quat_m

    y = jnp.asarray([0.0, 1.0, 0.0])
    d1 = np.asarray(quat_m.rotate(world.bodies.quat[a1], y))
    d2 = np.asarray(quat_m.rotate(world.bodies.quat[a2], y))
    assert float(np.dot(d1, d2)) > 0.999, f"axes not aligned: {d1} vs {d2}"
