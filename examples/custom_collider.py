"""User-defined collider shape (port of the reference's
`crates/avian2d/examples/custom_collider.rs`): an ellipsoid the engine has
no built-in narrowphase for, implemented entirely OUTSIDE the engine as a
``CustomShape`` support function — the counterpart of implementing
``AnyCollider`` and registering ``ColliderBackendPlugin<C>`` +
``NarrowPhasePlugin<C>`` (reference ``src/collision/collider/backend.rs``).

The registration is one static argument: ``physics_step(world, config,
custom_shapes=(ELLIPSOID,))``. Contacts against every built-in shape and
against other custom shapes come from the engine's generic support-map
pipeline; no per-pair user code.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from avian_tpu import (
    BodyType,
    CustomShape,
    PhysicsConfig,
    SceneBuilder,
    physics_step,
)


def make_ellipsoid():
    """Semi-axes (a, b, c) live in params[:3]. Support of an ellipsoid
    along d is A^2 d / |A d| with A = diag(a, b, c)."""

    def support(prm, d):
        a2 = prm[:3] * prm[:3]
        v = a2 * d
        return v / jnp.sqrt(jnp.maximum(jnp.dot(d, v), 1e-12))

    def aabb(prm):
        return prm[:3]

    return CustomShape("ellipsoid", support=support, aabb_half_extents=aabb)


ELLIPSOID = make_ellipsoid()


def ellipsoid_mass_inertia(a, b, c, density=1.0):
    m = density * 4.0 / 3.0 * np.pi * a * b * c
    i = m / 5.0 * np.asarray(
        [b * b + c * c, a * a + c * c, a * a + b * b], np.float32
    )
    return m, i


def main():
    b = SceneBuilder()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0, 1, 0))

    # A small field of oblate ellipsoids raining onto the ground (the
    # reference example spawns a grid of custom circles).
    a_, b_, c_ = 0.5, 0.25, 0.5
    m, i = ellipsoid_mass_inertia(a_, b_, c_)
    ids = []
    for gx in range(3):
        for gz in range(3):
            body = b.add_body(
                pos=(1.2 * gx - 1.2, 1.0 + 0.8 * ((gx + gz) % 3),
                     1.2 * gz - 1.2)
            )
            b.custom_collider(
                body, shape=ELLIPSOID, params=(a_, b_, c_), mass=m,
                inertia=i,
            )
            ids.append(body)

    # finalize() stores the CustomShape tuple on World.custom_shapes, so
    # physics_step and the spatial queries pick it up with no extra args.
    w = b.finalize(max_bodies=16, max_colliders=16, max_contacts=256)
    cfg = PhysicsConfig(max_colors=8)

    def one(w, _):
        return physics_step(w, cfg), None

    w = jax.jit(lambda w: jax.lax.scan(one, w, None, length=300)[0])(w)

    pos = np.asarray(w.bodies.pos)[ids]
    assert np.isfinite(pos).all(), "ellipsoids diverged"
    # Each rests on (or very near) the ground plane on its short axis, and
    # none fell through.
    assert (pos[:, 1] > 0.15).all(), pos[:, 1]
    assert (pos[:, 1] < 0.8).all(), pos[:, 1]

    # Spatial queries see custom shapes too: a downward ray over the first
    # ellipsoid hits its top surface.
    from avian_tpu.queries import cast_ray
    from avian_tpu.pipeline.broadphase import update_aabbs

    w = update_aabbs(w, cfg)
    target = pos[0]
    hit = cast_ray(w, (target[0], 3.0, target[2]), (0.0, -1.0, 0.0))
    assert bool(hit.hit), "ray missed the ellipsoid"
    assert abs(float(hit.point[1]) - 2.0 * b_) < 0.06, hit.point
    print(
        f"custom_collider: 9 ellipsoids settled, "
        f"rest heights {pos[:, 1].min():.3f}..{pos[:, 1].max():.3f} "
        f"(short semi-axis {b_})"
    )


if __name__ == "__main__":
    main()
