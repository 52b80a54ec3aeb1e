"""Persistent constraint-graph edge coloring.

TPU-native re-design of the reference's incremental 24-color constraint
graph (``src/dynamics/solver/constraint_graph.rs:36-48``): within a color no
two constraints share a *dynamic* body, so all constraints of a color can
apply impulses in parallel with provably disjoint writes — the guarantee the
reference exploits for ``par_for_each`` + unchecked access
(``plugin.rs:494-505``).

Like the reference's graph (which pushes/pops manifolds incrementally),
colors are PERSISTENT: each contact carries its color across steps
(``Contacts.color``), matched alongside the warm-start impulses. Per step:

1. build a fixed-degree CSR adjacency over dynamic-body incidences
   (one sort);
2. validate carried colors (same-color conflicts within a body's row keep
   only the lowest-indexed edge — conflicts only arise from sleep/type/
   dominance transitions, so this is almost always a no-op);
3. a few rounds of lowest-available-color proposal + per-body winner
   resolution assign colors to new/demoted edges;
4. leftovers land in the overflow color, solved with accumulated (Jacobi)
   scatter-adds — the analogue of the reference's serially-solved overflow
   color (``constraint_graph.rs:44-48``).

Everything is gathers + row-wise elementwise ops; the per-round dependent
memory-op chain (the latency limiter on this TPU runtime) is ~5 ops, and in
steady state one round suffices.

Static/kinematic bodies never receive impulses, so they cause no conflicts —
ground contacts freely share colors, like the reference's dedicated
static-contact colors.
"""

import jax
import jax.numpy as jnp

_ASSIGN_ROUNDS = 4  # proposal rounds for new/demoted edges per step
MAX_DEGREE = 32     # CSR degree cap per body (settled piles reach ~12-20)


def color_constraints(
    body_a, body_b, dyn_a, dyn_b, edge_mask, n_bodies, max_colors,
    prev_color=None,
):
    """Assign a color in [0, max_colors) to each edge.

    Args:
      body_a, body_b: i32[E] body slots per edge.
      dyn_a, dyn_b: bool[E] whether each endpoint responds to impulses.
      edge_mask: bool[E] edge participates in solving.
      n_bodies, max_colors: static ints.
      prev_color: optional i32[E] carried colors (-1 = unassigned).

    Returns:
      color: i32[E] (overflow color = max_colors - 1 for edges that didn't
      fit), is_overflow: bool[E].
    """
    e = body_a.shape[0]
    d = MAX_DEGREE
    assignable = max_colors - 1
    edge_idx = jnp.arange(e, dtype=jnp.int32)
    sentinel = jnp.asarray(e, jnp.int32)

    # ---- fixed-degree CSR adjacency (one sort per step) ----------------
    bodies2 = jnp.concatenate([body_a, body_b])
    edge2 = jnp.concatenate([edge_idx, edge_idx])
    inc_ok = jnp.concatenate([edge_mask & dyn_a, edge_mask & dyn_b])

    key = jnp.where(inc_ok, bodies2, n_bodies)
    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    # Rank within each body's run via cummax run-start (searchsorted's
    # binary search costs ~17 dependent gather rounds on this runtime).
    idx2 = jnp.arange(2 * e)
    new_run = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]]
    )
    rank = idx2 - jax.lax.cummax(jnp.where(new_run, idx2, 0))
    slot_ok = (rank < d) & (sorted_key < n_bodies)
    slot = jnp.clip(sorted_key, 0, n_bodies - 1) * d + rank
    table = jnp.full((n_bodies * d + 1,), sentinel, jnp.int32)
    table = table.at[jnp.where(slot_ok, slot, n_bodies * d)].set(
        edge2[order], mode="drop"
    )
    body_edges = table[:-1].reshape(n_bodies, d)  # edge ids; e = empty
    row_edge = body_edges

    # An edge is colorable only if every dynamic endpoint got a CSR slot.
    fit2 = jnp.zeros((2 * e,), bool).at[order].set(slot_ok)
    colorable = edge_mask & (~dyn_a | fit2[:e]) & (~dyn_b | fit2[e:])

    def unsort_entry_flag(entry_flag):
        """Map a per-CSR-slot bool [N, D] back to per-edge conjunction."""
        flat = jnp.concatenate(
            [entry_flag.reshape(-1), jnp.ones((1,), bool)]
        )
        per_entry = flat[jnp.where(slot_ok, slot, n_bodies * d)]
        back = jnp.zeros((2 * e,), bool).at[order].set(
            jnp.where(slot_ok, per_entry, True)
        )
        return (~dyn_a | back[:e]) & (~dyn_b | back[e:])

    # ---- 1+2. carry + validate persistent colors ------------------------
    if prev_color is None:
        color = jnp.full((e,), -1, jnp.int32)
    else:
        carried = jnp.where(
            colorable & (prev_color >= 0) & (prev_color < assignable),
            prev_color,
            -1,
        )
        color_pad = jnp.concatenate([carried, jnp.asarray([-2], jnp.int32)])
        row_color = color_pad[body_edges]  # [N, D]
        same = (row_color[:, :, None] == row_color[:, None, :]) & (
            row_color[:, None, :] >= 0
        )
        cand = jnp.where(same, row_edge[:, None, :], e)
        winner = jnp.min(cand, axis=-1)  # [N, D]
        entry_ok = (row_color < 0) | (winner == row_edge)
        keep = unsort_entry_flag(entry_ok)
        color = jnp.where(keep, carried, -1)

    # ---- 3. assign new/demoted edges -------------------------------------
    color_lanes = jnp.arange(assignable, dtype=jnp.int32)
    color_pad = jnp.concatenate([color, jnp.asarray([-2], jnp.int32)])
    row_color = color_pad[body_edges]
    used = jnp.any(
        row_color[:, :, None] == color_lanes[None, None, :], axis=1
    )  # [N, assignable]

    # Static-contact color priority (``constraint_graph.rs:44-48,179-219``):
    # the reference reserves its LAST colors for contacts against
    # static/kinematic bodies and solves them last, so ground/wall normal
    # impulses correct whatever earlier dynamic-dynamic impulses did —
    # fighting tunneling into static geometry. Here the same effect comes
    # from proposing the HIGHEST available color for such edges (the color
    # scan solves colors in ascending order).
    prefer_high = ~dyn_a | ~dyn_b

    unassigned = colorable & (color < 0)
    for _ in range(_ASSIGN_ROUNDS):
        both_avail = (
            (~used[body_a] | ~dyn_a[:, None])
            & (~used[body_b] | ~dyn_b[:, None])
            & unassigned[:, None]
        )
        has = jnp.any(both_avail, axis=-1)
        low = jnp.argmax(both_avail, axis=-1).astype(jnp.int32)
        high = (
            assignable
            - 1
            - jnp.argmax(both_avail[:, ::-1], axis=-1).astype(jnp.int32)
        )
        prop = jnp.where(has, jnp.where(prefer_high, high, low), -3)
        prop_pad = jnp.concatenate([prop, jnp.asarray([-4], jnp.int32)])
        row_prop = prop_pad[body_edges]
        same = (row_prop[:, :, None] == row_prop[:, None, :]) & (
            row_prop[:, None, :] >= 0
        )
        cand = jnp.where(same, row_edge[:, None, :], e)
        winner = jnp.min(cand, axis=-1)
        entry_win = (row_prop < 0) | (winner == row_edge)
        win = unsort_entry_flag(entry_win) & has & unassigned
        color = jnp.where(win, prop, color)
        unassigned = unassigned & ~win
        # Update the per-body used masks with the newly assigned colors.
        win_color_pad = jnp.concatenate(
            [jnp.where(win, prop, -5), jnp.asarray([-6], jnp.int32)]
        )
        row_new = win_color_pad[body_edges]
        used = used | jnp.any(
            row_new[:, :, None] == color_lanes[None, None, :], axis=1
        )

    is_overflow = (edge_mask & ~colorable) | unassigned
    color = jnp.where(
        edge_mask & (color < 0), max_colors - 1, jnp.where(color < 0, max_colors - 1, color)
    )
    return color, is_overflow
