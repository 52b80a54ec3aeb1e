"""Broadphase: uniform-grid cell list into a fixed-capacity pair buffer.

TPU-native replacement for the reference's x-axis sweep-and-prune
(``src/collision/broad_phase.rs:373-474``). A windowed sweep along any
1D order (x, or a Morton curve) systematically misses pairs in dense 3D
scenes — more than a window's worth of colliders can separate two
overlapping AABBs in the order. The cell list is *complete* by
construction:

1. cell size = the largest finite-collider AABB extent, so every AABB
   overlaps at most 2 cells per axis = 8 cells; each collider emits one
   entry per overlapped cell (a fixed [M, 8] table),
2. entries are sorted by packed cell id (XLA sort — deterministic), so
   all entries of one cell are contiguous; every overlapping pair
   co-occupies at least one cell and is at most a run-length apart,
3. candidate pairs are the ``sap_window`` following entries with the same
   cell id; each pair is emitted only in its *canonical* cell (the cell
   containing ``max(aabb_min_a, aabb_min_b)``) so no duplicates arise,
4. valid candidates are compacted into the fixed contact-pair buffer with
   an exclusive-prefix-sum scatter (deterministic order; the replacement
   for serial pair creation, SURVEY.md §2c item 4).

A run longer than the window (many tiny colliders crowding one cell) is
*detected* and reported via ``dropped`` so capacity bugs are loud, never
silent.

Colliders with unbounded AABBs (half-spaces) or AABBs that rival the scene
extent are excluded from the grid and paired densely against everything in
a separate pass, so a ground plane doesn't blow up the cell size.

Pair filtering matches the reference: layer masks (``layers.rs:423``), both
bodies non-dynamic, self-pairs within one body, sensor handling, and
joint-disabled contacts (``broad_phase.rs:417-439``).
"""

from dataclasses import dataclass, fields

import numpy as _np

import jax
import jax.numpy as jnp

from avian_tpu.core import types
from avian_tpu.core.config import PhysicsConfig
from avian_tpu.core.state import World
from avian_tpu.geometry import shapes
from avian_tpu.math import quat as quat_m

# Largest collider capacity for which the packed i32 pair key
# ``lo * M + hi`` is injective. Beyond it, pair matching in the
# narrowphase switches to lexicographic (lo, hi) binary search and
# ``pair_key`` degrades to a validity marker (no 64-bit ints: JAX x64 is
# disabled, and i64 sorts are emulated 2x on TPU anyway).
KEY_M_MAX = 46340

MAX_GLOBALS = 16  # max colliders in the dense pass (planes, huge bodies)

# The 8 cells an AABB spanning <= 2 cells per axis can overlap.
_CELL_OFFSETS = _np.asarray(
    [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
    _np.int32,
)


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass(frozen=True)
class BroadPhaseResult:
    """Candidate collider pairs, compacted into C slots (C = contact cap)."""

    collider_a: jnp.ndarray  # i32[C]
    collider_b: jnp.ndarray  # i32[C]
    pair_key: jnp.ndarray    # i32[C]; -1 for empty slots
    valid: jnp.ndarray       # bool[C]
    num_pairs: jnp.ndarray   # i32[]
    dropped: jnp.ndarray     # i32[] candidates that didn't fit in C slots


def update_collider_poses(world: World):
    """World pose of each collider = body pose ∘ local offset."""
    col = world.colliders
    b = world.bodies
    bq = b.quat[col.body_idx]
    bp = b.pos[col.body_idx]
    pos = bp + quat_m.rotate(bq, col.local_pos)
    quat = quat_m.mul(bq, col.local_quat)
    return pos, quat


def update_aabbs(
    world: World, config: PhysicsConfig, custom_shapes=()
) -> World:
    """Compute world AABBs, expanded for speculative contacts
    (reference ``update_aabb``, ``backend.rs:498``)."""
    col = world.colliders
    b = world.bodies
    custom_shapes = custom_shapes if custom_shapes else world.custom_shapes
    pos, quat = update_collider_poses(world)
    lo, hi = shapes.world_aabb(
        col.shape_type, col.params, pos, quat, custom_shapes
    )

    # Symmetric speculative expansion by clamped |v|*dt + margins.
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
    e = expand[:, None]
    return world.replace(
        colliders=col.replace(aabb_min=lo - e, aabb_max=hi + e)
    )


def _pair_filters(world: World, ca, cb):
    """Shared pair predicate: layers, activity, same-body, both-non-dynamic,
    joint-disabled."""
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

    # Joint-disabled contacts: any active joint between the two bodies with
    # collision_disabled. O(J) per pair is too much; instead build a small
    # key set of disabled body pairs and probe it (J is small).
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


def broad_phase(world: World, config: PhysicsConfig) -> BroadPhaseResult:
    col = world.colliders
    m = col.capacity
    c_cap = world.contacts.capacity
    w = min(config.sap_window, max(m - 1, 1))

    ext_c = jnp.max(col.aabb_max - col.aabb_min, axis=-1)
    is_plane = ext_c > shapes.BIG
    finite = col.active & ~is_plane
    # "Big" = much larger than the TYPICAL (median) collider: such bodies
    # (walls, platforms) would blow up the grid cell size, so they get the
    # dense pass instead. Median, not scene extent: in a small scene every
    # object is a large fraction of the scene, and a scene-relative
    # threshold would classify ALL colliders as big and overflow the dense
    # pass capacity.
    n_finite = jnp.sum(finite.astype(jnp.int32))
    ext_sorted = jnp.sort(jnp.where(finite, ext_c, jnp.inf))
    median_ext = ext_sorted[
        jnp.clip(n_finite // 2, 0, ext_c.shape[0] - 1)
    ]
    is_big = finite & (ext_c > 4.0 * jnp.maximum(median_ext, 1e-6))
    is_global = is_plane | is_big
    in_sweep = col.active & ~is_global

    # ---- uniform-grid cell list ----------------------------------------
    # Cell size = largest in-grid AABB extent -> every AABB spans <= 2
    # cells per axis, so [M, 8] entries cover all cell overlaps exactly.
    ext_axis = col.aabb_max - col.aabb_min
    cell = 1.001 * jnp.maximum(
        jnp.max(jnp.where(in_sweep[:, None], ext_axis, 0.0)), 1e-3
    )
    i0 = jnp.floor(col.aabb_min / cell).astype(jnp.int32)  # [m, 3]
    i1 = jnp.floor(col.aabb_max / cell).astype(jnp.int32)  # [m, 3]
    cc = i0[:, None, :] + jnp.asarray(_CELL_OFFSETS)[None, :, :]  # [m, 8, 3]
    entry_ok = jnp.all(cc <= i1[:, None, :], axis=-1) & in_sweep[:, None]
    # Pack wrapped 10-bit coords; wrap collisions merge far-apart cells,
    # which only adds candidates that the AABB test rejects.
    ckey = (
        ((cc[..., 0] & 1023) << 20)
        | ((cc[..., 1] & 1023) << 10)
        | (cc[..., 2] & 1023)
    )
    sentinel = jnp.iinfo(jnp.int32).max
    ckey = jnp.where(entry_ok, ckey, sentinel)  # [m, 8]

    order = jnp.argsort(ckey.reshape(-1), stable=True)  # [8m]
    skey = ckey.reshape(-1)[order]
    scol = (order // 8).astype(jnp.int32)  # collider id per sorted entry
    n_e = 8 * m

    # Window over following entries of the SAME cell. Runs longer than the
    # window are detected below and surfaced through `dropped`.
    i2 = jnp.arange(n_e)[:, None]                     # [8m, 1]
    k2 = jnp.arange(1, w + 1)[None, :]                # [1, w]
    jdx = jnp.minimum(i2 + k2, n_e - 1)               # [8m, w]
    win_a = jnp.broadcast_to(scol[:, None], (n_e, w))
    win_b = scol[jdx]
    same_cell = (skey[jdx] == skey[:, None]) & (skey[:, None] != sentinel)
    overlap = jnp.all(
        (col.aabb_min[win_b] <= col.aabb_max[win_a])
        & (col.aabb_min[win_a] <= col.aabb_max[win_b]),
        axis=-1,
    )
    # Canonical-cell emission: accept the pair only in the cell containing
    # max(aabb_min_a, aabb_min_b) so each pair is emitted exactly once.
    # floor is monotone, so that cell is just the per-axis max of the two
    # colliders' min-cells — and for overlapping AABBs it is always a
    # shared cell (amin_b <= amax_a per axis implies i0_b <= i1_a).
    canon = jnp.maximum(i0[win_a], i0[win_b])
    canon_key = (
        ((canon[..., 0] & 1023) << 20)
        | ((canon[..., 1] & 1023) << 10)
        | (canon[..., 2] & 1023)
    )
    win_ok = (
        (i2 + k2 < n_e)
        & same_cell
        & (win_a != win_b)
        & overlap
        & (canon_key == skey[:, None])
    )

    # Window-overflow detection: an entry whose rank within its cell run
    # exceeds the window may have missed a predecessor pair.
    new_run = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
    )
    run_start = jax.lax.cummax(
        jnp.where(new_run, jnp.arange(n_e), 0)
    )
    rank = jnp.arange(n_e) - run_start
    window_overflow = jnp.sum(
        ((rank > w) & (skey != sentinel)).astype(jnp.int32)
    )

    # ---- dense pass vs global colliders (planes), vectorized [G, m] ----
    g_cap = min(MAX_GLOBALS, m)
    g_score = jnp.where(is_global & col.active, 1, 0)
    g_idx = jnp.argsort(-g_score)[:g_cap]
    g_valid = g_score[g_idx] > 0
    # Globals beyond the dense-pass capacity would be tested in NEITHER
    # pass — count them into `dropped` so the failure is loud.
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
        # Avoid double-emitting global-global pairs.
        & (~is_global[None, :] | (glob_a < glob_b))
        & g_aabb_overlap
    )

    ca = jnp.concatenate([win_a.reshape(-1), glob_a.reshape(-1)])
    cb = jnp.concatenate([win_b.reshape(-1), glob_b.reshape(-1)])
    ok = jnp.concatenate([win_ok.reshape(-1), glob_ok.reshape(-1)])

    ok = ok & _pair_filters(world, ca, cb)

    # Canonical order (a < b) and pair key. Canonical-cell emission already
    # dedupes grid pairs; the global pass cannot duplicate grid pairs
    # (globals are excluded from the grid).
    lo = jnp.minimum(ca, cb)
    hi = jnp.maximum(ca, cb)
    if m > KEY_M_MAX:
        # ``lo * m + hi`` overflows i32: pair matching downstream uses
        # lexicographic (collider_a, collider_b) search instead, and
        # ``pair_key`` degrades to a validity marker (0 valid / -1 empty).
        key = jnp.zeros_like(lo)
    else:
        key = lo * m + hi

    # Deterministic compaction: exclusive prefix sum over validity gives
    # each valid candidate its output slot (fixed traversal order).
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

    return BroadPhaseResult(
        collider_a=a_f,
        collider_b=b_f,
        pair_key=key_f,
        valid=valid,
        num_pairs=num,
        dropped=(total_valid - num) + window_overflow + global_overflow,
    )
