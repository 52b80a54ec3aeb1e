"""Vectorized constraint-graph edge coloring.

TPU-native re-design of the reference's greedy 24-color constraint graph
(``src/dynamics/solver/constraint_graph.rs:36-48``): within a color no two
constraints share a *dynamic* body, so all constraints of a color can apply
impulses in parallel with provably disjoint scatter writes — the same
guarantee the reference exploits for `par_for_each` + unchecked access
(``plugin.rs:494-505``).

Algorithm: Luby-style maximal-independent-set rounds per color — an edge
joins color `c` if it is the lowest-indexed still-uncolored edge incident to
each of its dynamic endpoints. The per-body minima run over a fixed-degree
CSR adjacency built once per step with a single sort, so every MIS round is
pure gathers + row reductions (TPU scatters with duplicate indices are slow;
gathers are not). Edges that exceed the degree cap, or remain uncolored
after ``max_colors - 1`` colors, land in the overflow color, solved with
accumulated (Jacobi) scatter-adds — the analogue of the reference's
serially-solved overflow color (``constraint_graph.rs:44-48``).

Static/kinematic bodies never receive impulses, so they cause no conflicts —
ground contacts freely share colors, like the reference's dedicated
static-contact colors.
"""

import jax
import jax.numpy as jnp

_INNER_ROUNDS = 3   # MIS refinement rounds per color
MAX_DEGREE = 16     # CSR degree cap per body (pile bodies have ~6-12 contacts)


def color_constraints(body_a, body_b, dyn_a, dyn_b, edge_mask, n_bodies, max_colors):
    """Assign a color in [0, max_colors) to each edge.

    Args:
      body_a, body_b: i32[E] body slots per edge.
      dyn_a, dyn_b: bool[E] whether each endpoint responds to impulses.
      edge_mask: bool[E] edge participates in solving.
      n_bodies, max_colors: static ints.

    Returns:
      color: i32[E] (overflow color for edges that didn't fit),
      is_overflow: bool[E].
    """
    e = body_a.shape[0]
    d = MAX_DEGREE
    edge_idx = jnp.arange(e, dtype=jnp.int32)
    sentinel = jnp.asarray(e, jnp.int32)

    # ---- fixed-degree CSR adjacency (one sort per step) ----------------
    bodies2 = jnp.concatenate([body_a, body_b])
    dyn2 = jnp.concatenate([dyn_a, dyn_b])
    edge2 = jnp.concatenate([edge_idx, edge_idx])
    inc_ok = jnp.concatenate([edge_mask & dyn_a, edge_mask & dyn_b])

    key = jnp.where(inc_ok, bodies2, n_bodies)
    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    starts = jnp.searchsorted(sorted_key, jnp.arange(n_bodies + 1))
    rank = jnp.arange(2 * e) - starts[jnp.clip(sorted_key, 0, n_bodies)]
    slot_ok = (rank < d) & (sorted_key < n_bodies)
    slot = jnp.clip(sorted_key, 0, n_bodies - 1) * d + rank
    table = jnp.full((n_bodies * d + 1,), sentinel, jnp.int32)
    table = table.at[jnp.where(slot_ok, slot, n_bodies * d)].set(
        edge2[order], mode="drop"
    )
    body_edges = table[:-1].reshape(n_bodies, d)  # edge ids; e = empty

    # An edge is colorable only if every dynamic endpoint got a CSR slot.
    fit2 = jnp.zeros((2 * e,), bool).at[order].set(slot_ok)
    colorable = edge_mask & (~dyn_a | fit2[:e]) & (~dyn_b | fit2[e:])

    # ---- MIS rounds (gather-only, UNROLLED) ------------------------------
    # NOTE: unrolled on purpose. On this TPU runtime, dynamic gathers inside
    # lax.fori_loop/scan bodies execute ~10-20x slower than the same gathers
    # in straight-line code; these rounds are gather-dominated.
    color = jnp.full((e,), max_colors - 1, jnp.int32)
    uncolored = colorable
    for r in range((max_colors - 1) * _INNER_ROUNDS):
        c = r // _INNER_ROUNDS
        if r % _INNER_ROUNDS == 0:
            body_used = jnp.zeros((n_bodies,), bool)

        cand = (
            uncolored
            & ~(dyn_a & body_used[body_a])
            & ~(dyn_b & body_used[body_b])
        )
        key_e = jnp.where(cand, edge_idx, sentinel)
        key_pad = jnp.concatenate([key_e, sentinel[None]])
        min_inc = jnp.min(key_pad[body_edges], axis=1)  # [N]
        sel = cand & (
            (~dyn_a | (min_inc[body_a] == edge_idx))
            & (~dyn_b | (min_inc[body_b] == edge_idx))
        )
        color = jnp.where(sel, c, color)
        uncolored = uncolored & ~sel
        sel_pad = jnp.concatenate([sel, jnp.zeros((1,), bool)])
        body_used = body_used | jnp.any(sel_pad[body_edges], axis=1)

    is_overflow = uncolored | (edge_mask & ~colorable)
    return color, is_overflow
