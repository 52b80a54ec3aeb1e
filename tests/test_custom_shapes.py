"""User-defined collider shapes (``avian_tpu.CustomShape``).

Counterpart of the reference's custom-collider example
(``crates/avian2d/examples/custom_collider.rs``): a user shape the engine
has no built-in narrowphase for must still collide, rest, and sleep once
registered. Here the shape is an ellipsoid, whose support function is
``A^2 d / |A d|`` for ``A = diag(a, b, c)``.
"""

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


def _ellipsoid():
    def support(prm, d):
        a2 = prm[:3] * prm[:3]
        v = a2 * d
        return v / jnp.sqrt(jnp.maximum(jnp.dot(d, v), 1e-12))

    def aabb(prm):
        return prm[:3]

    return CustomShape("ellipsoid", support=support, aabb_half_extents=aabb)


ELLIPSOID = _ellipsoid()  # one instance: jit static arg hashes by identity


def _ellipsoid_mass_inertia(a, b, c, density=1.0):
    m = density * 4.0 / 3.0 * np.pi * a * b * c
    i = m / 5.0 * np.asarray(
        [b * b + c * c, a * a + c * c, a * a + b * b], np.float32
    )
    return m, i


def _drop_scene(extra=None):
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    a_, b_, c_ = 0.6, 0.3, 0.6
    m, i = _ellipsoid_mass_inertia(a_, b_, c_)
    body = b.add_body(pos=(0.0, 1.5, 0.0))
    b.custom_collider(body, index=0, params=(a_, b_, c_), mass=m, inertia=i)
    if extra is not None:
        extra(b)
    return b, body


def _settle(b, steps=240):
    w = b.finalize(max_bodies=8, max_colliders=8, max_contacts=64)
    cfg = PhysicsConfig(max_colors=4)

    def one(w, _):
        return physics_step(w, cfg, custom_shapes=(ELLIPSOID,)), None

    return jax.jit(
        lambda w: jax.lax.scan(one, w, None, length=steps)[0]
    )(w)


def test_ellipsoid_rests_on_plane():
    b, body = _drop_scene()
    w = _settle(b)
    p = np.asarray(w.bodies.pos[body])
    assert np.isfinite(p).all()
    # An axis-aligned oblate ellipsoid rests on its short (y) semi-axis.
    assert abs(p[1] - 0.3) < 0.05, p


def test_ellipsoid_vs_box_and_ellipsoid():
    # A box under one ellipsoid and a second ellipsoid on top: exercises
    # custom-vs-box and custom-vs-custom dispatch in one scene.
    def extra(b):
        box_body = b.add_body(pos=(3.0, 0.5, 0.0))
        b.box(box_body, 0.5, 0.5, 0.5)
        m, i = _ellipsoid_mass_inertia(0.6, 0.3, 0.6)
        e2 = b.add_body(pos=(3.0, 2.0, 0.0))
        b.custom_collider(e2, index=0, params=(0.6, 0.3, 0.6), mass=m,
                          inertia=i)
        e3 = b.add_body(pos=(0.05, 2.6, 0.0))
        b.custom_collider(e3, index=0, params=(0.6, 0.3, 0.6), mass=m,
                          inertia=i)
        extra.ids = (box_body, e2, e3)

    b, body = _drop_scene(extra)
    w = _settle(b, steps=300)
    box_body, e2, e3 = extra.ids
    pos = np.asarray(w.bodies.pos)
    assert np.isfinite(pos).all()
    # Ellipsoid e2 rests on the unit box (top at y=1): center ~ 1 + 0.3.
    assert abs(pos[e2][1] - 1.3) < 0.08, pos[e2]
    # Ellipsoid e3 ends up supported above the first one (custom-custom
    # contact kept it from falling through).
    assert pos[e3][1] > 0.45, pos[e3]


def test_custom_collider_requires_mass():
    b = SceneBuilder()
    body = b.add_body()
    try:
        b.custom_collider(body, index=0, params=(1.0,))
    except ValueError as e:
        assert "mass" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_world_carried_shape_and_queries():
    """shape= registration rides on World.custom_shapes: physics_step
    needs no explicit argument, and ray/point/shape queries see the
    custom collider."""
    import jax.numpy as jnp

    from avian_tpu import ShapeType
    from avian_tpu.pipeline.broadphase import update_aabbs
    from avian_tpu.queries import (
        cast_ray,
        cast_shape,
        point_intersections,
        project_point,
    )

    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    a_, b2, c_ = 0.6, 0.3, 0.6
    m, i = _ellipsoid_mass_inertia(a_, b2, c_)
    body = b.add_body(pos=(0.0, 1.0, 0.0))
    b.custom_collider(body, shape=ELLIPSOID, params=(a_, b2, c_), mass=m,
                      inertia=i)
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=32)
    assert w.custom_shapes == (ELLIPSOID,)

    cfg = PhysicsConfig(max_colors=4)

    def one(w, _):
        return physics_step(w, cfg), None  # no custom_shapes arg

    w = jax.jit(lambda w: jax.lax.scan(one, w, None, length=200)[0])(w)
    y = float(w.bodies.pos[body][1])
    assert abs(y - 0.3) < 0.05, y

    w = update_aabbs(w, cfg)
    # Ray straight down hits the ellipsoid's top (y ~ 0.6).
    hit = cast_ray(w, (0.0, 3.0, 0.0), (0.0, -1.0, 0.0))
    assert bool(hit.hit) and int(hit.collider) == 1
    assert abs(float(hit.point[1]) - 2 * 0.3) < 0.05, hit.point
    # Point projection from above: closest point is the top.
    pr = project_point(w, (0.0, 2.0, 0.0))
    assert int(pr["collider"]) == 1
    assert abs(float(pr["distance"]) - (2.0 - 0.6)) < 0.06, pr["distance"]
    # Containment: the center is inside, a far point is not.
    inside = np.asarray(point_intersections(w, (0.0, y, 0.0)))
    assert 1 in inside.tolist()
    outside = np.asarray(point_intersections(w, (3.0, 3.0, 3.0)))
    assert 1 not in outside.tolist()
    # Shape cast: a sphere swept down from above stops ~at the surface.
    sh = cast_shape(
        w, ShapeType.SPHERE, (0.2,), (0.0, 3.0, 0.0),
        (0.0, 0.0, 0.0, 1.0), (0.0, -1.0, 0.0), max_distance=5.0,
    )
    assert bool(sh.hit) and int(sh.collider) == 1
    assert abs(float(sh.distance) - (3.0 - 0.6 - 0.2)) < 0.08, sh.distance
