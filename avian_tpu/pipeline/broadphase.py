"""Broadphase: sort-based sweep-and-prune into a fixed-capacity pair buffer.

TPU-native re-design of the reference's x-axis sweep-and-prune
(``src/collision/broad_phase.rs:373-474``): instead of an insertion-sorted
interval list with serial pair emission, we

1. sort colliders by AABB min-x (XLA sort — deterministic),
2. test each collider against the next ``sap_window`` colliders in sorted
   order (windowed candidate generation, all pairs at once on the VPU),
3. compact valid candidates into the fixed contact-pair buffer with a
   validity-keyed sort (the deterministic replacement for serial pair
   creation, SURVEY.md §2c item 4).

Colliders with unbounded AABBs (half-spaces) are excluded from the sweep and
paired densely against everything in a separate pass, so a ground plane
doesn't blow up the sweep window.

Pair filtering matches the reference: layer masks (``layers.rs:423``), both
bodies non-dynamic, self-pairs within one body, sensor handling, and
joint-disabled contacts (``broad_phase.rs:417-439``).
"""

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp

from avian_tpu.core import types
from avian_tpu.core.config import PhysicsConfig
from avian_tpu.core.state import World
from avian_tpu.geometry import shapes
from avian_tpu.math import quat as quat_m

MAX_GLOBALS = 8  # max colliders with unbounded AABBs (ground planes etc.)


def _expand_bits(v):
    """Spread the low 10 bits of ``v`` so consecutive bits are 3 apart
    (Morton encoding helper)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


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


def update_aabbs(world: World, config: PhysicsConfig) -> World:
    """Compute world AABBs, expanded for speculative contacts
    (reference ``update_aabb``, ``backend.rs:498``)."""
    col = world.colliders
    b = world.bodies
    pos, quat = update_collider_poses(world)
    lo, hi = shapes.world_aabb(col.shape_type, col.params, pos, quat)

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
    scene_ext = jnp.max(
        jnp.where(
            finite[:, None], col.aabb_max, -jnp.inf
        ).max(axis=0)
        - jnp.where(finite[:, None], col.aabb_min, jnp.inf).min(axis=0)
    )
    # Relatively huge colliders (walls, big platforms) overlap far more
    # neighbors than any window covers — test them densely instead.
    is_big = finite & (ext_c > 0.25 * jnp.maximum(scene_ext, 1e-6))
    is_global = is_plane | is_big
    in_sweep = col.active & ~is_global

    # ---- windowed sweep in Morton (Z-curve) order ---------------------
    # The reference sweeps along min-x (``broad_phase.rs:373-474``), which
    # works for its serial interval list but is catastrophic for a windowed
    # sweep on grid-like scenes (hundreds of colliders share one x slice).
    # Sorting by the Morton code of the AABB center keeps 3D-adjacent
    # colliders adjacent in the order, so a modest window finds all local
    # pairs. Deterministic: stable sort on the code.
    center = 0.5 * (col.aabb_min + col.aabb_max)
    lo_w = jnp.min(
        jnp.where(in_sweep[:, None], center, jnp.inf), axis=0
    )
    hi_w = jnp.max(
        jnp.where(in_sweep[:, None], center, -jnp.inf), axis=0
    )
    extent = jnp.maximum(hi_w - lo_w, 1e-6)
    q = jnp.clip(
        ((center - lo_w) / extent * 1023.0).astype(jnp.int32), 0, 1023
    )
    sort_key = jnp.where(
        in_sweep,
        (_expand_bits(q[:, 0]) << 2)
        | (_expand_bits(q[:, 1]) << 1)
        | _expand_bits(q[:, 2]),
        jnp.iinfo(jnp.int32).max,
    )
    order = jnp.argsort(sort_key, stable=True)
    s_min = col.aabb_min[order]
    s_max = col.aabb_max[order]
    s_ok = in_sweep[order]

    # Candidate (i, i+k) for k in 1..w over sorted order — one vectorized
    # [m, w] computation (no per-k op chains).
    i2 = jnp.arange(m)[:, None]                       # [m, 1]
    k2 = jnp.arange(1, w + 1)[None, :]                # [1, w]
    jdx = jnp.minimum(i2 + k2, m - 1)                 # [m, w]
    win_a = jnp.broadcast_to(order[:, None], (m, w))
    win_b = order[jdx]
    overlap = jnp.all(
        (s_min[jdx] <= s_max[:, None, :]) & (s_min[:, None, :] <= s_max[jdx]),
        axis=-1,
    )
    win_ok = (i2 + k2 < m) & s_ok[:, None] & s_ok[jdx] & overlap

    # ---- dense pass vs global colliders (planes), vectorized [G, m] ----
    g_cap = min(MAX_GLOBALS, m)
    g_score = jnp.where(is_global & col.active, 1, 0)
    g_idx = jnp.argsort(-g_score)[:g_cap]
    g_valid = g_score[g_idx] > 0
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

    # Canonical order (a < b) and pair key.
    lo = jnp.minimum(ca, cb)
    hi = jnp.maximum(ca, cb)
    key = jnp.where(ok, lo * m + hi, jnp.iinfo(jnp.int32).max)

    # Deterministic compaction: sort by key, take the first c_cap.
    # Sorting by key also dedupes adjacent duplicates cheaply.
    sort_idx = jnp.argsort(key)
    key_s = key[sort_idx]
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), key_s[1:] == key_s[:-1]]
    )
    key_s = jnp.where(dup, jnp.iinfo(jnp.int32).max, key_s)
    # Re-sort to push dropped duplicates to the end.
    resort = jnp.argsort(key_s)
    key_f = key_s[resort][:c_cap]
    valid = key_f != jnp.iinfo(jnp.int32).max
    a_f = (key_f // m).astype(jnp.int32)
    b_f = (key_f % m).astype(jnp.int32)
    a_f = jnp.where(valid, a_f, 0)
    b_f = jnp.where(valid, b_f, 0)

    total_valid = jnp.sum((key_s != jnp.iinfo(jnp.int32).max).astype(jnp.int32))
    num = jnp.sum(valid.astype(jnp.int32))

    return BroadPhaseResult(
        collider_a=a_f,
        collider_b=b_f,
        pair_key=jnp.where(valid, key_f, -1),
        valid=valid,
        num_pairs=num,
        dropped=total_valid - num,
    )
