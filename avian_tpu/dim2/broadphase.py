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


def _pair_filters(world: World2D, ca, cb):
    col = world.colliders
    b = world.bodies
    ba = col.body_idx[ca]
    bb = col.body_idx[cb]

    both_active = col.active[ca] & col.active[cb]
    diff_body = ba != bb
    layers_ok = (
        ((col.layer_members[ca] & col.layer_filter[cb]) > 0)
        & ((col.layer_members[cb] & col.layer_filter[ca]) > 0)
    )
    dyn_a = (b.body_type[ba] == types.BodyType.DYNAMIC) & b.active[ba]
    dyn_b = (b.body_type[bb] == types.BodyType.DYNAMIC) & b.active[bb]
    some_dynamic = dyn_a | dyn_b

    j = world.joints
    jka = jnp.minimum(j.body_a, j.body_b)
    jkb = jnp.maximum(j.body_a, j.body_b)
    n_bodies = b.capacity
    jkey = jnp.where(
        j.active & j.collision_disabled, jka * n_bodies + jkb, -1
    )
    pka = jnp.minimum(ba, bb)
    pkb = jnp.maximum(ba, bb)
    pkey = pka * n_bodies + pkb
    joint_disabled = jnp.any(pkey[:, None] == jkey[None, :], axis=-1)

    return both_active & diff_body & layers_ok & some_dynamic & ~joint_disabled


def broad_phase(world: World2D, config: PhysicsConfig) -> BroadPhaseResult2D:
    col = world.colliders
    m = col.capacity
    c_cap = world.contacts.capacity
    w = min(config.sap_window, max(m - 1, 1))

    ext_c = jnp.max(col.aabb_max - col.aabb_min, axis=-1)
    finite = col.active & ~col.is_plane
    n_finite = jnp.sum(finite.astype(jnp.int32))
    ext_sorted = jnp.sort(jnp.where(finite, ext_c, jnp.inf))
    median_ext = ext_sorted[jnp.clip(n_finite // 2, 0, ext_c.shape[0] - 1)]
    is_big = finite & (ext_c > 4.0 * jnp.maximum(median_ext, 1e-6))
    is_global = col.is_plane | is_big
    in_sweep = col.active & ~is_global

    # ---- uniform-grid cell list (4 cells per AABB in 2D) ----------------
    ext_axis = col.aabb_max - col.aabb_min
    cell = 1.001 * jnp.maximum(
        jnp.max(jnp.where(in_sweep[:, None], ext_axis, 0.0)), 1e-3
    )
    i0 = jnp.floor(col.aabb_min / cell).astype(jnp.int32)  # [m, 2]
    i1 = jnp.floor(col.aabb_max / cell).astype(jnp.int32)
    cc = i0[:, None, :] + jnp.asarray(_CELL_OFFSETS)[None, :, :]  # [m, 4, 2]
    entry_ok = jnp.all(cc <= i1[:, None, :], axis=-1) & in_sweep[:, None]
    ckey = ((cc[..., 0] & 0x7FFF) << 15) | (cc[..., 1] & 0x7FFF)
    sentinel = jnp.iinfo(jnp.int32).max
    ckey = jnp.where(entry_ok, ckey, sentinel)  # [m, 4]

    order = jnp.argsort(ckey.reshape(-1), stable=True)  # [4m]
    skey = ckey.reshape(-1)[order]
    scol = (order // 4).astype(jnp.int32)
    n_e = 4 * m

    i2 = jnp.arange(n_e)[:, None]
    k2 = jnp.arange(1, w + 1)[None, :]
    jdx = jnp.minimum(i2 + k2, n_e - 1)
    win_a = jnp.broadcast_to(scol[:, None], (n_e, w))
    win_b = scol[jdx]
    same_cell = (skey[jdx] == skey[:, None]) & (skey[:, None] != sentinel)
    overlap = jnp.all(
        (col.aabb_min[win_b] <= col.aabb_max[win_a])
        & (col.aabb_min[win_a] <= col.aabb_max[win_b]),
        axis=-1,
    )
    canon = jnp.maximum(i0[win_a], i0[win_b])
    canon_key = ((canon[..., 0] & 0x7FFF) << 15) | (canon[..., 1] & 0x7FFF)
    win_ok = (
        (i2 + k2 < n_e)
        & same_cell
        & (win_a != win_b)
        & overlap
        & (canon_key == skey[:, None])
    )

    new_run = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    run_start = jax.lax.cummax(jnp.where(new_run, jnp.arange(n_e), 0))
    rank = jnp.arange(n_e) - run_start
    window_overflow = jnp.sum(
        ((rank > w) & (skey != sentinel)).astype(jnp.int32)
    )

    # ---- dense pass vs globals ------------------------------------------
    g_cap = min(MAX_GLOBALS, m)
    g_score = jnp.where(is_global & col.active, 1, 0)
    g_idx = jnp.argsort(-g_score)[:g_cap]
    g_valid = g_score[g_idx] > 0
    global_overflow = jnp.maximum(jnp.sum(g_score) - g_cap, 0)
    all_i = jnp.arange(m)
    glob_a = jnp.broadcast_to(all_i[None, :], (g_cap, m))
    glob_b = jnp.broadcast_to(g_idx[:, None], (g_cap, m))
    g_aabb_overlap = jnp.all(
        (col.aabb_min[g_idx][:, None, :] <= col.aabb_max[None, :, :])
        & (col.aabb_min[None, :, :] <= col.aabb_max[g_idx][:, None, :]),
        axis=-1,
    )
    glob_ok = (
        g_valid[:, None]
        & col.active[None, :]
        & (glob_a != glob_b)
        & (~is_global[None, :] | (glob_a < glob_b))
        & g_aabb_overlap
    )

    ca = jnp.concatenate([win_a.reshape(-1), glob_a.reshape(-1)])
    cb = jnp.concatenate([win_b.reshape(-1), glob_b.reshape(-1)])
    ok = jnp.concatenate([win_ok.reshape(-1), glob_ok.reshape(-1)])
    ok = ok & _pair_filters(world, ca, cb)

    lo = jnp.minimum(ca, cb)
    hi = jnp.maximum(ca, cb)
    key = lo * m + hi

    slot_end = jnp.cumsum(ok.astype(jnp.int32))
    total_valid = slot_end[-1]
    slot = jnp.where(ok, slot_end - 1, c_cap)
    a_f = jnp.zeros((c_cap,), jnp.int32).at[slot].set(
        jnp.asarray(ca, jnp.int32), mode="drop"
    )
    b_f = jnp.zeros((c_cap,), jnp.int32).at[slot].set(
        jnp.asarray(cb, jnp.int32), mode="drop"
    )
    key_f = jnp.full((c_cap,), -1, jnp.int32).at[slot].set(
        key.astype(jnp.int32), mode="drop"
    )
    num = jnp.minimum(total_valid, c_cap)
    valid = jnp.arange(c_cap) < num

    return BroadPhaseResult2D(
        collider_a=a_f,
        collider_b=b_f,
        pair_key=key_f,
        valid=valid,
        num_pairs=num,
        dropped=(total_valid - num) + window_overflow + global_overflow,
    )
