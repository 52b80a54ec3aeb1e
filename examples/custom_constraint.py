"""User-defined XPBD constraint (port of the reference's
`crates/avian3d/examples/custom_constraint.rs`): a CenterDistanceConstraint
that keeps the distance between two bodies' centers of mass at a rest
distance, implemented entirely OUTSIDE the engine via the ``custom_joints``
extension point (the counterpart of implementing ``XpbdConstraint``,
``src/dynamics/solver/xpbd/mod.rs:23-52``)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax.numpy as jnp
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step
from avian_tpu.api import custom as cc

ANCHOR, CUBE = 0, 1
REST_DISTANCE = 2.5


class CenterDistanceConstraint:
    """Keeps |com_b - com_a| at ``rest``. Static (hashable) object; the
    per-step data pytree returned by ``prepare`` carries the prepare-time
    center difference (exactly what the reference example prepares) plus a
    Lagrange accumulator for force readback."""

    def __init__(self, body_a, body_b, rest, compliance=0.0):
        self.body_a = body_a
        self.body_b = body_b
        self.rest = rest
        self.compliance = compliance

    def prepare(self, world, s, config):
        return {
            "center_difference": cc.center_difference(
                world, self.body_a, self.body_b
            ),
            "total_lagrange": jnp.zeros((), jnp.float32),
        }

    def solve(self, s, data, h):
        ba = jnp.asarray([self.body_a], jnp.int32)
        bb = jnp.asarray([self.body_b], jnp.int32)
        z = jnp.zeros((1, 3), jnp.float32)
        sep = cc.current_separation(
            s, ba, bb, z, z, data["center_difference"][None, :]
        )
        dist = jnp.linalg.norm(sep, axis=-1)
        dir_ = sep / jnp.maximum(dist, 1e-9)[..., None]
        # Violation vector: how far past/short of the rest distance we are.
        correction = dir_ * (dist - self.rest)[..., None]
        s, dl = cc.apply_positional_correction(
            s, ba, bb, z, z, correction, self.compliance, h
        )
        return s, {
            "center_difference": data["center_difference"],
            "total_lagrange": data["total_lagrange"] + dl[0],
        }


CONSTRAINT = CenterDistanceConstraint(ANCHOR, CUBE, REST_DISTANCE)


def main():
    b = SceneBuilder()
    anchor = b.add_body(body_type=BodyType.STATIC, pos=(0, 0, 0))
    b.box(anchor, 0.25, 0.25, 0.25)
    assert anchor == ANCHOR
    cube = b.add_body(pos=(REST_DISTANCE, 0.0, 0.0))
    b.box(cube, 0.25, 0.25, 0.25)
    assert cube == CUBE
    world = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)

    config = PhysicsConfig(max_colors=4)
    for _ in range(180):
        world = physics_step(world, config, custom_joints=CONSTRAINT)

    pos = np.asarray(world.bodies.pos)
    dist = float(np.linalg.norm(pos[CUBE] - pos[ANCHOR]))
    assert np.isfinite(pos).all()
    # The cube swung like a pendulum but the center distance held.
    assert abs(dist - REST_DISTANCE) < 0.05, f"distance drifted: {dist}"
    assert pos[CUBE][1] < -1.0, "cube should have swung downward"
    print(f"custom constraint held: |d|={dist:.4f} (rest {REST_DISTANCE}), "
          f"cube at {pos[CUBE].round(3)}")


if __name__ == "__main__":
    main()
