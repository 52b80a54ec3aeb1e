"""2D grid-broadphase core: compact-then-gather formulation (round 5).

Mirrors the 3D rewrite in ``pipeline/broadphase.py``: per-collider fields
are gathered ONCE into sorted-entry order, every window access is a static
shift (contiguous slice) of a sorted array, candidates live in a per-entry
u32 bitmask, and compaction is output-driven (one cumsum + run expansion).
See BASELINE.md's round-5 cost model: on this runtime candidate-scale
gathers/scatters cost 3.6-12.9 ms EACH while entry-scale ops are ~free.
"""

import jax
import jax.numpy as jnp
import numpy as _np

from avian_tpu.core import types
from avian_tpu.pipeline.broadphase import _select_bit

_CELL_OFFSETS_2D = _np.asarray(
    [[dx, dy] for dx in (0, 1) for dy in (0, 1)], _np.int32
)


def grid_pairs_2d(world, config, in_sweep, is_global, c_cap, max_globals):
    """Candidate pairs for the 2D engine. Returns (ca, cb, got, dropped)."""
    col = world.colliders
    b = world.bodies
    m = col.capacity
    n_e = 4 * m
    w = min(config.sap_window, max(n_e - 1, 1))
    if w > 32:
        raise ValueError(
            f"sap_window={config.sap_window} > 32: the candidate bitmask "
            "is one u32 per grid entry"
        )

    body = col.body_idx
    dyn = (b.body_type[body] == types.BodyType.DYNAMIC) & b.active[body]

    ext_axis = col.aabb_max - col.aabb_min
    cell = 1.001 * jnp.maximum(
        jnp.max(jnp.where(in_sweep[:, None], ext_axis, 0.0)), 1e-3
    )
    i0 = jnp.floor(col.aabb_min / cell).astype(jnp.int32)  # [m, 2]
    i1 = jnp.floor(col.aabb_max / cell).astype(jnp.int32)
    cc = i0[:, None, :] + jnp.asarray(_CELL_OFFSETS_2D)[None, :, :]
    entry_ok = jnp.all(cc <= i1[:, None, :], axis=-1) & in_sweep[:, None]
    ckey = ((cc[..., 0] & 0x7FFF) << 15) | (cc[..., 1] & 0x7FFF)
    sentinel = jnp.iinfo(jnp.int32).max
    ckey = jnp.where(entry_ok, ckey, sentinel)  # [m, 4]

    order = jnp.argsort(ckey.reshape(-1), stable=True)  # [4m]
    skey = ckey.reshape(-1)[order]
    scol = (order // 4).astype(jnp.int32)

    # ---- ONE gather into sorted-entry order ---------------------------
    fpack = jnp.concatenate([col.aabb_min, col.aabb_max], axis=-1)  # [m,4]
    ipack = jnp.concatenate(
        [
            i0,
            body[:, None],
            col.layer_members[:, None].astype(jnp.int32),
            col.layer_filter[:, None].astype(jnp.int32),
            dyn[:, None].astype(jnp.int32),
        ],
        axis=-1,
    )  # [m, 6]
    sf = fpack[scol]
    si = ipack[scol]

    inf4 = jnp.asarray([jnp.inf] * 2 + [-jnp.inf] * 2, jnp.float32)
    spad_key = jnp.concatenate([skey, jnp.full((w,), sentinel, jnp.int32)])
    spad_f = jnp.concatenate([sf, jnp.broadcast_to(inf4, (w, 4))])
    spad_i = jnp.concatenate([si, jnp.zeros((w, 6), jnp.int32)])

    a_min = sf[:, 0:2]
    a_max = sf[:, 2:4]
    a_i0 = si[:, 0:2]
    a_body = si[:, 2]
    a_mem = si[:, 3]
    a_fil = si[:, 4]
    a_dyn = si[:, 5]

    bits = jnp.zeros((n_e,), jnp.uint32)
    for k in range(1, w + 1):
        b_key = spad_key[k:k + n_e]
        b_f = spad_f[k:k + n_e]
        b_i = spad_i[k:k + n_e]
        same_cell = (b_key == skey) & (skey != sentinel)
        overlap = jnp.all(
            (b_f[:, 0:2] <= a_max) & (a_min <= b_f[:, 2:4]), axis=-1
        )
        canon = jnp.maximum(a_i0, b_i[:, 0:2])
        canon_key = ((canon[:, 0] & 0x7FFF) << 15) | (canon[:, 1] & 0x7FFF)
        diff_body = a_body != b_i[:, 2]
        # != 0, not > 0: full 0xFFFFFFFF layer masks are -1 in the i32 pack.
        layers_ok = ((a_mem & b_i[:, 4]) != 0) & ((b_i[:, 3] & a_fil) != 0)
        some_dyn = (a_dyn | b_i[:, 5]) > 0
        ok_k = (
            same_cell
            & (canon_key == skey)
            & overlap
            & diff_body
            & layers_ok
            & some_dyn
        )
        bits = bits | (ok_k.astype(jnp.uint32) << (k - 1))

    new_run = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    run_start = jax.lax.cummax(jnp.where(new_run, jnp.arange(n_e), 0))
    rank = jnp.arange(n_e) - run_start
    window_overflow = jnp.sum(
        ((rank > w) & (skey != sentinel)).astype(jnp.int32)
    )

    # ---- output-driven compaction --------------------------------------
    cnt = jax.lax.population_count(bits).astype(jnp.int32)
    ends = jnp.cumsum(cnt)
    offsets = ends - cnt
    total_grid = ends[-1]
    mark_slot = jnp.where(cnt > 0, offsets, c_cap)
    mark = (
        jnp.full((c_cap,), -1, jnp.int32)
        .at[mark_slot]
        .max(jnp.arange(n_e, dtype=jnp.int32), mode="drop")
    )
    entry_of = jax.lax.cummax(mark)
    grid_got = (entry_of >= 0) & (jnp.arange(c_cap) < total_grid)
    e_safe = jnp.maximum(entry_of, 0)
    r = jnp.arange(c_cap) - offsets[e_safe]
    k_of = _select_bit(bits[e_safe], r) + 1
    ga = scol[e_safe]
    gb = scol[jnp.minimum(e_safe + k_of, n_e - 1)]

    # ---- dense pass vs globals -----------------------------------------
    g_cap = min(max_globals, m)
    g_score = jnp.where(is_global & col.active, 1, 0)
    g_idx = jnp.argsort(-g_score)[:g_cap]
    g_valid = g_score[g_idx] > 0
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
        & (~is_global[None, :] | (all_i[None, :] < g_idx[:, None]))
        & g_aabb_overlap
        & (body[g_idx][:, None] != body[None, :])
        & ((col.layer_members[g_idx][:, None] & col.layer_filter[None, :]) > 0)
        & ((col.layer_members[None, :] & col.layer_filter[g_idx][:, None]) > 0)
        & (dyn[g_idx][:, None] | dyn[None, :])
    )
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

    ca = jnp.where(grid_got, ga, jnp.where(glob_got, ga2, 0))
    cb = jnp.where(grid_got, gb, jnp.where(glob_got, gb2, 0))
    got = grid_got | glob_got

    # Joint-disabled contacts, probed on the C compacted pairs.
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
        pkey = jnp.minimum(pba, pbb) * n_bodies + jnp.maximum(pba, pbb)
        joint_disabled = jnp.any(pkey[:, None] == jkey[None, :], axis=-1)
        got = got & ~joint_disabled

    dropped = (
        jnp.maximum(total_grid + total_glob - c_cap, 0)
        + window_overflow
        + global_overflow
    )
    return ca, cb, got, dropped
