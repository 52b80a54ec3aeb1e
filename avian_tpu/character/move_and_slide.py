"""Kinematic character movement: sweep -> move to TOI -> project velocity on
contact planes -> repeat, with pre/post depenetration.

Counterpart of the reference's ``MoveAndSlide`` system param
(``src/character_controller/move_and_slide.rs:19-36,464,745,868``) and its
multi-plane velocity projection with crease handling
(``velocity_project.rs:15,122``). Fixed iteration counts (max_slides
unrolled) keep it jittable; use inside a jitted game/RL step.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from avian_tpu.geometry.narrowphase import compute_manifold
from avian_tpu.math import vec
from avian_tpu.pipeline.broadphase import update_collider_poses
from avian_tpu.queries.filter import QueryFilter, collider_query_mask
from avian_tpu.queries.shapecast import _cast_pairs, cast_shape


@dataclass(frozen=True)
class MoveAndSlideConfig:
    """Mirrors ``MoveAndSlideConfig`` defaults (move_and_slide.rs)."""

    max_slides: int = 4
    skin_width: float = 0.01
    max_depenetration_iters: int = 2
    min_move_distance: float = 1e-5


def project_velocity(velocity, normal, prev_normals, num_prev):
    """Project ``velocity`` out of a contact plane, sliding along creases
    where two planes meet (``velocity_project.rs:122``).

    prev_normals: f32[K, 3] previously hit plane normals (padded);
    num_prev: how many are valid.
    """
    vn = jnp.minimum(vec.dot(velocity, normal), 0.0)
    v = velocity - vn * normal

    # Crease handling: if v still pushes into an earlier plane, slide along
    # the crease line between that plane and the new one.
    def fix_one(k, v):
        p = prev_normals[k]
        valid = k < num_prev
        into = vec.dot(v, p) < -1e-6
        crease = vec.normalize_or(jnp.cross(normal, p), jnp.zeros(3))
        v_crease = crease * vec.dot(v, crease)
        return jnp.where(valid & into, v_crease, v)

    v = jax.lax.fori_loop(0, prev_normals.shape[0], fix_one, v)
    return v


def depenetrate(
    world, shape_type, params, pos, quat,
    qfilter: QueryFilter = None, iters: int = 2, skin: float = 0.01,
    shape_pairs=None,
):
    """Push the shape out of all overlapping colliders
    (``move_and_slide.rs:868``)."""
    qfilter = qfilter if qfilter is not None else QueryFilter()
    pairs = _cast_pairs(world, int(shape_type), shape_pairs)
    col = world.colliders
    cpos, cquat = update_collider_poses(world)
    ok = collider_query_mask(col, qfilter)

    quat = jnp.asarray(quat, jnp.float32)
    st = jnp.asarray(int(shape_type), jnp.int32)
    prm = jnp.zeros(8, jnp.float32).at[: len(params)].set(
        jnp.asarray(params, jnp.float32)
    )

    def one_iter(_, p):
        def against(ct, cp, cq, cprm, valid):
            m = compute_manifold(st, p, quat, prm, ct, cp, cq, cprm, shape_pairs=pairs)
            sep = jnp.min(m.separation)
            push = jnp.where(
                valid & (sep < skin), (skin - sep), 0.0
            )
            # Manifold normal points from the cast shape toward the
            # collider; push the shape the other way.
            return -m.normal * jnp.minimum(push, 1.0)

        pushes = jax.vmap(against)(
            col.shape_type, cpos, cquat, col.params, ok
        )
        return p + jnp.sum(pushes, axis=0)

    return jax.lax.fori_loop(0, iters, one_iter, jnp.asarray(pos, jnp.float32))


def move_and_slide(
    world,
    shape_type,
    params,
    pos,
    quat,
    velocity,
    dt,
    config: MoveAndSlideConfig = MoveAndSlideConfig(),
    qfilter: QueryFilter = None,
):
    """Move a kinematic shape by ``velocity * dt``, sliding along surfaces.

    Returns (new_pos, new_velocity, grounded_normal_or_zero).
    Mirrors ``MoveAndSlide::move_and_slide`` (``move_and_slide.rs:464``).
    """
    qfilter = qfilter if qfilter is not None else QueryFilter()
    pos = jnp.asarray(pos, jnp.float32)
    quat = jnp.asarray(quat, jnp.float32)
    velocity = jnp.asarray(velocity, jnp.float32)

    pos = depenetrate(
        world, shape_type, params, pos, quat, qfilter,
        config.max_depenetration_iters, config.skin_width,
    )

    k = config.max_slides
    planes = jnp.zeros((k, 3), jnp.float32)
    num_planes = jnp.asarray(0, jnp.int32)
    remaining = jnp.asarray(dt, jnp.float32)
    last_normal = jnp.zeros(3, jnp.float32)

    for _ in range(config.max_slides):
        speed = vec.length(velocity)
        move_dist = speed * remaining
        do_move = move_dist > config.min_move_distance
        direction = vec.normalize_or(velocity, jnp.zeros(3))

        hit = cast_shape(
            world, shape_type, params, pos, quat, direction,
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
        world, shape_type, params, pos, quat, qfilter,
        config.max_depenetration_iters, config.skin_width,
    )
    return pos, velocity, last_normal
