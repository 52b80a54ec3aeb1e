"""Physics picking: pointer rays -> hit bodies.

TPU-native counterpart of the reference's ``PhysicsPickingPlugin``
(``src/picking/mod.rs:1-60``): each pointer casts a ray into the physics
world; the closest hit (honoring a ``PhysicsPickingFilter``-style query
filter and an optional pickable mask — the ``PhysicsPickable``
require-markers mode) becomes the pick target. Batched over pointers with
``vmap``, so a whole cursor/touch set picks in one fused kernel.
"""

import jax
import jax.numpy as jnp

from avian_tpu.queries.filter import QueryFilter
from avian_tpu.queries.raycast import RayHit, cast_ray


def pick(
    world,
    pointer_origin,
    pointer_direction,
    max_distance=1e30,
    solid=True,
    qfilter: QueryFilter = None,
    pickable=None,
) -> RayHit:
    """Closest pickable hit for one pointer ray.

    ``pickable``: optional bool[M] mask of pickable colliders — the
    counterpart of requiring ``PhysicsPickable`` markers
    (``picking/mod.rs:34-43``). None = everything pickable.
    """
    qfilter = qfilter if qfilter is not None else QueryFilter()
    if pickable is not None:
        pickable = jnp.asarray(pickable, bool)
        qfilter = QueryFilter(
            mask=qfilter.mask,
            excluded=jnp.broadcast_to(qfilter.excluded, pickable.shape)
            | ~pickable,
        )
    return cast_ray(
        world, pointer_origin, pointer_direction, max_distance, solid, qfilter
    )


def pick_batch(
    world,
    pointer_origins,
    pointer_directions,
    max_distance=1e30,
    solid=True,
    qfilter: QueryFilter = None,
    pickable=None,
) -> RayHit:
    """Batch picking: [P, 3] pointer origins/directions -> RayHit with a
    leading [P] axis (all pointers in one vmapped kernel)."""
    return jax.vmap(
        lambda o, d: pick(
            world, o, d, max_distance, solid, qfilter, pickable
        )
    )(
        jnp.asarray(pointer_origins, jnp.float32),
        jnp.asarray(pointer_directions, jnp.float32),
    )


def pick_2d(
    world,
    pointer_origin,
    pointer_direction,
    max_distance=1e30,
    solid=True,
    qfilter: QueryFilter = None,
    pickable=None,
):
    """Closest pickable hit for one pointer ray on the 2D profile
    (``World2D``); same pickable-mask semantics as :func:`pick`."""
    from avian_tpu.dim2.queries import cast_ray as cast_ray_2d

    qfilter = qfilter if qfilter is not None else QueryFilter()
    if pickable is not None:
        pickable = jnp.asarray(pickable, bool)
        qfilter = QueryFilter(
            mask=qfilter.mask,
            excluded=jnp.broadcast_to(qfilter.excluded, pickable.shape)
            | ~pickable,
        )
    return cast_ray_2d(
        world, pointer_origin, pointer_direction, max_distance, solid, qfilter
    )
