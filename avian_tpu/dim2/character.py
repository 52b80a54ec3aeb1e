"""2D kinematic character movement: sweep -> move to TOI -> project
velocity on contact lines -> repeat, with pre/post depenetration.

The ``avian2d`` compile of the reference's ``MoveAndSlide`` system param
(``src/character_controller/move_and_slide.rs:19-36,464,745,868``); same
structure as the 3D ``avian_tpu/character/move_and_slide.py``. In 2D two
contact lines meet in a corner rather than a crease, so the multi-plane
projection (``velocity_project.rs:122``) collapses to a full stop when the
slid velocity still pushes into an earlier plane.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from avian_tpu.dim2.narrowphase import _normalize, compute_manifold_2d
from avian_tpu.dim2.queries import _world_geom, cast_shape
from avian_tpu.queries.filter import QueryFilter, collider_query_mask


@dataclass(frozen=True)
class MoveAndSlideConfig2D:
    """Mirrors ``MoveAndSlideConfig`` defaults (move_and_slide.rs)."""

    max_slides: int = 4
    skin_width: float = 0.01
    max_depenetration_iters: int = 2
    min_move_distance: float = 1e-5


def project_velocity(velocity, normal, prev_normals, num_prev):
    """Slide ``velocity`` along a contact line; stop in corners
    (2D reading of ``velocity_project.rs:122``)."""
    vn = jnp.minimum(jnp.dot(velocity, normal), 0.0)
    v = velocity - vn * normal

    def fix_one(k, v):
        p = prev_normals[k]
        valid = k < num_prev
        into = jnp.dot(v, p) < -1e-6
        return jnp.where(valid & into, jnp.zeros_like(v), v)

    return jax.lax.fori_loop(0, prev_normals.shape[0], fix_one, v)


def depenetrate(world, shape, pos, angle=0.0, qfilter: QueryFilter = None,
                iters: int = 2, skin: float = 0.01):
    """Push the query shape out of all overlapping colliders
    (``move_and_slide.rs:868``)."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    verts, count, radius = shape
    col = world.colliders
    cpos, cangle, _, _ = _world_geom(world)
    ok = collider_query_mask(col, qfilter)
    sa = jnp.asarray(angle, jnp.float32)

    def one_iter(_, p):
        def against(cp, cang, cv, cc, cr, cpl, valid):
            m = compute_manifold_2d(
                p, sa, verts, count, radius, jnp.asarray(False),
                cp, cang, cv, cc, cr, cpl,
            )
            sep = jnp.min(m.separation)
            push = jnp.where(valid & (sep < skin), skin - sep, 0.0)
            # Manifold normal points query -> collider; push the other way.
            return -m.normal * jnp.minimum(push, 1.0)

        pushes = jax.vmap(against)(
            cpos, cangle, col.poly_verts, col.vert_count, col.radius,
            col.is_plane, ok,
        )
        return p + jnp.sum(pushes, axis=0)

    return jax.lax.fori_loop(0, iters, one_iter, jnp.asarray(pos, jnp.float32))


def move_and_slide(world, shape, pos, velocity, dt, angle=0.0,
                   config: MoveAndSlideConfig2D = MoveAndSlideConfig2D(),
                   qfilter: QueryFilter = None):
    """Move a kinematic shape by ``velocity * dt``, sliding along surfaces.

    ``shape`` is a (verts, count, radius) triple from
    :mod:`avian_tpu.dim2.queries`. Returns
    ``(new_pos, new_velocity, last_normal_or_zero)``; mirrors
    ``MoveAndSlide::move_and_slide`` (``move_and_slide.rs:464``).
    """
    qfilter = qfilter if qfilter is not None else QueryFilter()
    pos = jnp.asarray(pos, jnp.float32)
    velocity = jnp.asarray(velocity, jnp.float32)

    pos = depenetrate(
        world, shape, pos, angle, qfilter,
        config.max_depenetration_iters, config.skin_width,
    )

    k = config.max_slides
    planes = jnp.zeros((k, 2), jnp.float32)
    num_planes = jnp.asarray(0, jnp.int32)
    remaining = jnp.asarray(dt, jnp.float32)
    last_normal = jnp.zeros(2, jnp.float32)

    for _ in range(config.max_slides):
        speed = jnp.linalg.norm(velocity)
        move_dist = speed * remaining
        do_move = move_dist > config.min_move_distance
        direction = jnp.where(
            speed > 1e-9, _normalize(velocity), jnp.zeros(2)
        )

        hit = cast_shape(
            world, shape, pos, angle, direction,
            jnp.maximum(move_dist, 0.0), qfilter,
        )
        travel = jnp.where(
            hit.hit,
            jnp.maximum(hit.distance - config.skin_width, 0.0),
            move_dist,
        )
        travel = jnp.where(do_move, travel, 0.0)
        pos = pos + direction * travel
        used = jnp.where(speed > 1e-9, travel / jnp.maximum(speed, 1e-9), 0.0)
        remaining = jnp.maximum(remaining - used, 0.0)

        blocked = hit.hit & do_move
        n = hit.normal
        new_velocity = project_velocity(velocity, n, planes, num_planes)
        velocity = jnp.where(blocked, new_velocity, velocity)
        planes = planes.at[jnp.minimum(num_planes, k - 1)].set(
            jnp.where(blocked, n, planes[jnp.minimum(num_planes, k - 1)])
        )
        num_planes = num_planes + blocked.astype(jnp.int32)
        last_normal = jnp.where(blocked, n, last_normal)

    pos = depenetrate(
        world, shape, pos, angle, qfilter,
        config.max_depenetration_iters, config.skin_width,
    )
    return pos, velocity, last_normal
