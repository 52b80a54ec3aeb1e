"""Standalone shape-pair queries — the reference's ``contact_query``
module (``src/collision/collider/parry/contact_query.rs:1-15``: ``contact``,
``contact_manifolds``, ``closest_points``, ``distance``,
``intersection_test``, ``time_of_impact``) as jittable functions over
(shape_type, params, pos, quat) tuples.

All functions take two shapes given as ``(shape_type, pos, quat, params)``
with params padded to 8 lanes; pass ``shape_pairs``/``convex_verts`` like
:func:`avian_tpu.geometry.narrowphase.compute_manifold`.
"""

import jax.numpy as jnp

from avian_tpu.geometry.narrowphase import compute_manifold
from avian_tpu.math import vec


def contact_manifolds(
    type_a, pos_a, quat_a, params_a, type_b, pos_b, quat_b, params_b,
    shape_pairs=None, convex_verts=None, custom_shapes=(),
):
    """The full manifold (up to 4 points) between two shapes — the same
    kernel the narrowphase uses."""
    return compute_manifold(
        type_a, pos_a, quat_a, params_a, type_b, pos_b, quat_b, params_b,
        shape_pairs=shape_pairs, convex_verts=convex_verts,
        custom_shapes=custom_shapes,
    )


def contact(
    type_a, pos_a, quat_a, params_a, type_b, pos_b, quat_b, params_b,
    prediction_distance=0.0, **kw,
):
    """Deepest contact within ``prediction_distance``:
    (found, point_a, point_b, normal, penetration)."""
    m = contact_manifolds(
        type_a, pos_a, quat_a, params_a, type_b, pos_b, quat_b, params_b,
        **kw,
    )
    i = jnp.argmin(m.separation)
    sep = m.separation[i]
    found = (m.count > 0) & (sep <= prediction_distance)
    return found, m.point_a[i], m.point_b[i], m.normal, -sep


def closest_points(
    type_a, pos_a, quat_a, params_a, type_b, pos_b, quat_b, params_b, **kw
):
    """(are_intersecting, point_on_a, point_on_b)."""
    found, pa, pb, _n, pen = contact(
        type_a, pos_a, quat_a, params_a, type_b, pos_b, quat_b, params_b,
        prediction_distance=jnp.inf, **kw,
    )
    return (found & (pen > 0.0)), pa, pb


def distance(
    type_a, pos_a, quat_a, params_a, type_b, pos_b, quat_b, params_b, **kw
):
    """Minimum distance between the shapes (0 when intersecting)."""
    m = contact_manifolds(
        type_a, pos_a, quat_a, params_a, type_b, pos_b, quat_b, params_b,
        **kw,
    )
    sep = jnp.min(m.separation)
    return jnp.where(m.count > 0, jnp.maximum(sep, 0.0), jnp.inf)


def intersection_test(
    type_a, pos_a, quat_a, params_a, type_b, pos_b, quat_b, params_b, **kw
):
    """True if the shapes overlap."""
    m = contact_manifolds(
        type_a, pos_a, quat_a, params_a, type_b, pos_b, quat_b, params_b,
        **kw,
    )
    return (m.count > 0) & (jnp.min(m.separation) < 0.0)


def time_of_impact(
    type_a, pos_a, quat_a, params_a, vel_a,
    type_b, pos_b, quat_b, params_b, vel_b,
    max_t, iters: int = 16, **kw,
):
    """Linear-sweep time of impact in ``[0, max_t]`` (conservative
    advancement; the reference delegates to Parry ``cast_shapes``).
    Returns (hit, t)."""
    import jax

    rel = vel_a - vel_b
    dist0 = vec.length(rel)
    dirn = vec.normalize_or(rel, jnp.asarray([1.0, 0.0, 0.0]))

    def body(_, state):
        t, done = state
        m = contact_manifolds(
            type_a, pos_a + rel * t, quat_a, params_a,
            type_b, pos_b, quat_b, params_b, **kw,
        )
        sep = jnp.min(m.separation)
        approach = jnp.dot(dirn, m.normal) * dist0
        hit = sep < 1e-4
        step = jnp.where(
            approach > 1e-6, sep / jnp.maximum(approach, 1e-6), 2.0 * max_t
        )
        new_t = jnp.where(done | hit, t, t + jnp.maximum(step, 0.0))
        return jnp.minimum(new_t, max_t * 1.01), done | hit

    t, hit = jax.lax.fori_loop(
        0, iters, body, (jnp.asarray(0.0), jnp.asarray(False))
    )
    return hit & (t <= max_t), t
