"""2D broadphase: uniform-grid cell list into a fixed-capacity pair buffer.

2D profile of ``avian_tpu/pipeline/broadphase.py`` (see its docstring for
the design rationale vs the reference's sweep-and-prune,
``src/collision/broad_phase.rs:373-474``): cell size = largest in-grid AABB
extent so every AABB overlaps <= 4 cells; entries sorted by packed cell id;
windowed same-cell candidates with canonical-cell dedup; prefix-sum
compaction; half-spaces and oversized colliders take a dense pass.
"""

from dataclasses import dataclass, fields

import numpy as _np

import jax
import jax.numpy as jnp

from avian_tpu.core import types
from avian_tpu.core.config import PhysicsConfig
from avian_tpu.dim2.narrowphase import rot, rotate
from avian_tpu.dim2.state import MAX_POLY_VERTS, World2D

MAX_GLOBALS = 16

_CELL_OFFSETS = _np.asarray(
    [[dx, dy] for dx in (0, 1) for dy in (0, 1)], _np.int32
)


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass(frozen=True)
class BroadPhaseResult2D:
    collider_a: jnp.ndarray  # i32[C]
    collider_b: jnp.ndarray  # i32[C]
    pair_key: jnp.ndarray    # i32[C]; -1 empty
    valid: jnp.ndarray       # bool[C]
    num_pairs: jnp.ndarray   # i32[]
    dropped: jnp.ndarray     # i32[]


def update_collider_poses(world: World2D):
    col = world.colliders
    b = world.bodies
    ba = b.angle[col.body_idx]
    c, s = rot(ba)
    pos = b.pos[col.body_idx] + rotate(c, s, col.local_pos)
    angle = ba + col.local_angle
    return pos, angle


def update_aabbs(world: World2D, config: PhysicsConfig) -> World2D:
    col = world.colliders
    b = world.bodies
    pos, angle = update_collider_poses(world)

    c, s = rot(angle)
    wv = pos[:, None, :] + rotate(c[:, None], s[:, None], col.poly_verts)
    vmask = (
        jnp.arange(MAX_POLY_VERTS)[None, :] < col.vert_count[:, None]
    )[..., None]
    lo = jnp.min(jnp.where(vmask, wv, jnp.inf), axis=1) - col.radius[:, None]
    hi = jnp.max(jnp.where(vmask, wv, -jnp.inf), axis=1) + col.radius[:, None]
    # Half-spaces: unbounded AABB (routed to the dense pass).
    big = jnp.asarray(1e12, jnp.float32)
    lo = jnp.where(col.is_plane[:, None], -big, lo)
    hi = jnp.where(col.is_plane[:, None], big, hi)

    v = b.lin_vel[col.body_idx]
    speed = jnp.linalg.norm(v, axis=-1)
    spec = jnp.minimum(
        col.speculative_margin,
        jnp.full_like(speed, config.narrow_phase.default_speculative_margin),
    )
    expand = (
        jnp.minimum(speed * config.dt, spec)
        + col.collision_margin
        + config.narrow_phase.contact_tolerance * config.length_unit
    )
    e = jnp.where(col.is_plane, 0.0, expand)[:, None]
    return world.replace(
        colliders=col.replace(aabb_min=lo - e, aabb_max=hi + e)
    )


def broad_phase(world: World2D, config: PhysicsConfig) -> BroadPhaseResult2D:
    """Round-5 compact-then-gather formulation (see ``broadphase_impl``
    and the 3D twin's docstring for the dataflow rationale)."""
    from avian_tpu.dim2.broadphase_impl import grid_pairs_2d

    col = world.colliders
    m = col.capacity
    c_cap = world.contacts.capacity

    ext_c = jnp.max(col.aabb_max - col.aabb_min, axis=-1)
    finite = col.active & ~col.is_plane
    n_finite = jnp.sum(finite.astype(jnp.int32))
    ext_sorted = jnp.sort(jnp.where(finite, ext_c, jnp.inf))
    median_ext = ext_sorted[jnp.clip(n_finite // 2, 0, ext_c.shape[0] - 1)]
    is_big = finite & (ext_c > 4.0 * jnp.maximum(median_ext, 1e-6))
    is_global = col.is_plane | is_big
    in_sweep = col.active & ~is_global

    ca, cb, got, dropped = grid_pairs_2d(
        world, config, in_sweep, is_global, c_cap, MAX_GLOBALS
    )

    lo = jnp.minimum(ca, cb)
    hi = jnp.maximum(ca, cb)
    key = jnp.where(got, lo * m + hi, -1)
    num = jnp.sum(got.astype(jnp.int32))

    return BroadPhaseResult2D(
        collider_a=jnp.where(got, ca, 0),
        collider_b=jnp.where(got, cb, 0),
        pair_key=key,
        valid=got,
        num_pairs=num,
        dropped=dropped,
    )
