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


def _select_bit(bits, r):
    """Position of the ``r``-th (0-based) set bit of ``bits`` (u32).

    Binary search over popcounts of widening low masks: 5 elementwise
    rounds, no gathers. Undefined (returns 32-ish) if r >= popcount."""
    pos = jnp.zeros_like(r)
    for width in (16, 8, 4, 2, 1):
        low = jnp.uint32((1 << width) - 1)
        mask = low << pos.astype(jnp.uint32)
        c = jax.lax.population_count(bits & mask).astype(jnp.int32)
        take_high = r >= c
        r = jnp.where(take_high, r - c, r)
        pos = jnp.where(take_high, pos + width, pos)
    return pos


def broad_phase(world: World, config: PhysicsConfig) -> BroadPhaseResult:
    """Grid cell-list broadphase, compact-then-gather formulation.

    Round-5 hot-path redesign (evidence: tools/profile_broadphase.py,
    BASELINE.md round-5 table — the round-4 window-gather formulation spent
    226 ms/step in per-candidate ``_pair_filters`` gathers and 48 ms in
    scatter compaction at 10k colliders). The cell-list *algorithm* is
    unchanged (complete by construction, canonical-cell dedup, loud
    overflow); the *dataflow* is rebuilt around one fact this runtime's
    microbenchmarks established: random gathers cost ~5-8 ns per element
    while contiguous slices and elementwise ops are ~free. So:

    1. per-collider fields (AABB, min-cell, body, layers, dynamic flag) are
       packed into TWO tables and gathered ONCE into sorted-entry order
       ([8m] rows instead of [8m*w] candidates),
    2. every window access ``x[i + k]`` over the cell-sorted entry order is
       a static SHIFT (contiguous slice) of a sorted-entry array — zero
       gathers in the O(8m*w) candidate sweep, which becomes pure
       elementwise work producing a per-entry u32 candidate BITMASK,
    3. compaction is output-driven: per-entry popcounts -> exclusive prefix
       sum -> a cummax run-expansion maps each OUTPUT slot back to its
       (entry, k) via the r-th-set-bit of the entry's bitmask — the only
       per-candidate-scale op left is one [8m] cumsum,
    4. the joint-disabled probe runs on the C compacted pairs, not on the
       2.7M candidates.
    """
    col = world.colliders
    b = world.bodies
    m = col.capacity
    c_cap = world.contacts.capacity
    n_e = 8 * m
    w = min(config.sap_window, max(n_e - 1, 1))
    if w > 32:
        raise ValueError(
            f"sap_window={config.sap_window} > 32: the candidate bitmask "
            "is one u32 per grid entry"
        )

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

    # ---- per-collider filter fields (elementwise / [m]-sized gathers) ---
    body = col.body_idx
    dyn = (b.body_type[body] == types.BodyType.DYNAMIC) & b.active[body]

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

    # ---- ONE gather into sorted-entry order ------------------------------
    # f32 pack: aabb_min(3), aabb_max(3). i32 pack: i0(3), body, members,
    # filter, dyn.
    fpack = jnp.concatenate([col.aabb_min, col.aabb_max], axis=-1)  # [m, 6]
    ipack = jnp.concatenate(
        [
            i0,
            body[:, None],
            col.layer_members[:, None],
            col.layer_filter[:, None],
            dyn[:, None].astype(jnp.int32),
        ],
        axis=-1,
    )  # [m, 7]
    sf = fpack[scol]          # [8m, 6]
    si = ipack[scol]          # [8m, 7]

    # ---- window sweep as static shifts ----------------------------------
    # Pad so column k is the contiguous slice [k : k + n_e]. Sentinel pads
    # guarantee same_cell is False past the end.
    inf6 = jnp.asarray([jnp.inf] * 3 + [-jnp.inf] * 3, jnp.float32)
    spad_key = jnp.concatenate([skey, jnp.full((w,), sentinel, jnp.int32)])
    spad_f = jnp.concatenate([sf, jnp.broadcast_to(inf6, (w, 6))])
    spad_i = jnp.concatenate([si, jnp.zeros((w, 7), jnp.int32)])

    a_min = sf[:, 0:3]
    a_max = sf[:, 3:6]
    a_i0 = si[:, 0:3]
    a_body = si[:, 3]
    a_mem = si[:, 4]
    a_fil = si[:, 5]
    a_dyn = si[:, 6]

    bits = jnp.zeros((n_e,), jnp.uint32)
    for k in range(1, w + 1):
        b_key = spad_key[k:k + n_e]
        b_f = spad_f[k:k + n_e]
        b_i = spad_i[k:k + n_e]
        same_cell = (b_key == skey) & (skey != sentinel)
        overlap = jnp.all(
            (b_f[:, 0:3] <= a_max) & (a_min <= b_f[:, 3:6]), axis=-1
        )
        # Canonical-cell emission: accept the pair only in the cell
        # containing max(aabb_min_a, aabb_min_b) so each pair is emitted
        # exactly once. floor is monotone, so that cell is the per-axis max
        # of the two colliders' min-cells — for overlapping AABBs always a
        # shared cell (amin_b <= amax_a per axis implies i0_b <= i1_a).
        canon = jnp.maximum(a_i0, b_i[:, 0:3])
        canon_key = (
            ((canon[:, 0] & 1023) << 20)
            | ((canon[:, 1] & 1023) << 10)
            | (canon[:, 2] & 1023)
        )
        # Pair filters, elementwise between sorted-entry fields and their
        # shifts (was: 10 gathers per candidate row — 226 ms/step at 10k).
        diff_body = a_body != b_i[:, 3]
        # != 0, not > 0: the masks ride the i32 ipack, where a full
        # 0xFFFFFFFF layer mask is -1.
        layers_ok = ((a_mem & b_i[:, 5]) != 0) & ((b_i[:, 4] & a_fil) != 0)
        some_dyn = (a_dyn | b_i[:, 6]) > 0
        ok_k = (
            same_cell
            & (canon_key == skey)
            & overlap
            & diff_body
            & layers_ok
            & some_dyn
        )
        bits = bits | (ok_k.astype(jnp.uint32) << (k - 1))

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

    # ---- output-driven compaction of grid candidates --------------------
    cnt = jax.lax.population_count(bits).astype(jnp.int32)       # [8m]
    ends = jnp.cumsum(cnt)
    offsets = ends - cnt                                          # exclusive
    total_grid = ends[-1]
    # Run expansion: mark each producing entry's first output slot, then
    # cummax fills the run. Entries with cnt == 0 never mark, and offsets
    # of producing entries are strictly increasing, so marks are unique.
    mark_slot = jnp.where(cnt > 0, offsets, c_cap)
    mark = (
        jnp.full((c_cap,), -1, jnp.int32)
        .at[mark_slot]
        .max(jnp.arange(n_e, dtype=jnp.int32), mode="drop")
    )
    entry_of = jax.lax.cummax(mark)                               # [c_cap]
    grid_got = (entry_of >= 0) & (jnp.arange(c_cap) < total_grid)
    e_safe = jnp.maximum(entry_of, 0)
    r = jnp.arange(c_cap) - offsets[e_safe]
    k_of = _select_bit(bits[e_safe], r) + 1
    ga = scol[e_safe]
    gb = scol[jnp.minimum(e_safe + k_of, n_e - 1)]

    # ---- dense pass vs global colliders (planes), vectorized [G, m] ----
    g_cap = min(MAX_GLOBALS, m)
    g_score = jnp.where(is_global & col.active, 1, 0)
    g_idx = jnp.argsort(-g_score)[:g_cap]
    g_valid = g_score[g_idx] > 0
    # Globals beyond the dense-pass capacity would be tested in NEITHER
    # pass — count them into `dropped` so the failure is loud.
    global_overflow = jnp.maximum(jnp.sum(g_score) - g_cap, 0)
    all_i = jnp.arange(m)
    g_min = col.aabb_min[g_idx]
    g_max = col.aabb_max[g_idx]
    g_aabb_overlap = jnp.all(
        (g_min[:, None, :] <= col.aabb_max[None, :, :])
        & (col.aabb_min[None, :, :] <= g_max[:, None, :]),
        axis=-1,
    )
    glob_ok = (
        g_valid[:, None]
        & col.active[None, :]
        & (g_idx[:, None] != all_i[None, :])
        # Avoid double-emitting global-global pairs.
        & (~is_global[None, :] | (all_i[None, :] < g_idx[:, None]))
        & g_aabb_overlap
        # Same elementwise filters as the grid sweep (the m side indexes
        # by identity — no gathers).
        & (body[g_idx][:, None] != body[None, :])
        & ((col.layer_members[g_idx][:, None] & col.layer_filter[None, :]) > 0)
        & ((col.layer_members[None, :] & col.layer_filter[g_idx][:, None]) > 0)
        & (dyn[g_idx][:, None] | dyn[None, :])
    )
    # Compact global pairs after the grid region: ONE i32 scatter of the
    # packed candidate id g*m + j (16m sources, vs 3 scatters of 2.7M rows
    # in the round-4 formulation), then unpack elementwise.
    gl_flat = glob_ok.reshape(-1)
    gl_ends = jnp.cumsum(gl_flat.astype(jnp.int32))
    total_glob = gl_ends[-1]
    gl_slot = jnp.where(gl_flat, total_grid + gl_ends - 1, c_cap)
    gl_id = (
        jnp.full((c_cap,), -1, jnp.int32)
        .at[gl_slot]
        .set(jnp.arange(g_cap * m, dtype=jnp.int32), mode="drop")
    )
    glob_got = gl_id >= 0
    gl_id = jnp.maximum(gl_id, 0)
    gb2 = g_idx[gl_id // m]
    ga2 = gl_id % m

    # ---- assemble ---------------------------------------------------------
    ca = jnp.where(grid_got, ga, jnp.where(glob_got, ga2, 0))
    cb = jnp.where(grid_got, gb, jnp.where(glob_got, gb2, 0))
    got = grid_got | glob_got

    # Joint-disabled contacts, probed on the C compacted pairs (was: on
    # every candidate row). O(C x J) elementwise; J is small.
    j = world.joints
    if j.capacity > 0:
        jka = jnp.minimum(j.body_a, j.body_b)
        jkb = jnp.maximum(j.body_a, j.body_b)
        n_bodies = b.capacity
        jkey = jnp.where(
            j.active & j.collision_disabled, jka * n_bodies + jkb, -1
        )
        pba = body[ca]
        pbb = body[cb]
        pkey = (
            jnp.minimum(pba, pbb) * n_bodies + jnp.maximum(pba, pbb)
        )
        joint_disabled = jnp.any(pkey[:, None] == jkey[None, :], axis=-1)
        got = got & ~joint_disabled

    # Canonical order (a < b) and pair key. Canonical-cell emission already
    # dedupes grid pairs; the global pass cannot duplicate grid pairs
    # (globals are excluded from the grid).
    lo = jnp.minimum(ca, cb)
    hi = jnp.maximum(ca, cb)
    if m > KEY_M_MAX:
        # ``lo * m + hi`` overflows i32: pair matching downstream uses
        # lexicographic (collider_a, collider_b) search instead, and
        # ``pair_key`` degrades to a validity marker (0 valid / -1 empty).
        key = jnp.where(got, 0, -1)
    else:
        key = jnp.where(got, lo * m + hi, -1)

    total_valid = total_grid + total_glob
    num = jnp.sum(got.astype(jnp.int32))

    return BroadPhaseResult(
        collider_a=jnp.where(got, ca, 0),
        collider_b=jnp.where(got, cb, 0),
        pair_key=key,
        valid=got,
        num_pairs=num,
        dropped=(
            jnp.maximum(total_valid - c_cap, 0)
            + window_overflow
            + global_overflow
        ),
    )
