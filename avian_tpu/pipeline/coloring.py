"""Vectorized constraint-graph edge coloring.

TPU-native re-design of the reference's greedy 24-color constraint graph
(``src/dynamics/solver/constraint_graph.rs:36-48``): within a color no two
constraints share a *dynamic* body, so all constraints of a color can apply
impulses in parallel with provably disjoint scatter writes — the same
guarantee the reference exploits for `par_for_each` + unchecked access
(``plugin.rs:494-505``), here exploited for vectorized gather/solve/scatter.

Instead of serial greedy coloring we run, per color, a few rounds of
Luby-style maximal-independent-set selection on the conflict graph: an edge
joins color `c` if it is the lowest-indexed still-uncolored edge incident to
each of its dynamic endpoints (computed with scatter-min), iterated to make
the set near-maximal. Leftover edges after `max_colors - 1` colors land in
the overflow color, solved with averaged (Jacobi) impulse application — the
analogue of the reference's serially-solved overflow color
(``constraint_graph.rs:44-48``).

Static/kinematic bodies never receive impulses, so they cause no conflicts —
ground contacts all share one color, like the reference's dedicated
static-contact colors (``constraint_graph.rs:44-48,179-219``).
"""

import jax.numpy as jnp

_INNER_ROUNDS = 4  # MIS refinement rounds per color


def color_constraints(body_a, body_b, dyn_a, dyn_b, edge_mask, n_bodies, max_colors):
    """Assign a color in [0, max_colors) to each edge.

    Args:
      body_a, body_b: i32[E] body slots per edge.
      dyn_a, dyn_b: bool[E] whether each endpoint responds to impulses.
      edge_mask: bool[E] edge participates in solving.
      n_bodies: static int.
      max_colors: static int (last color = overflow).

    Returns:
      color: i32[E] (overflow color for edges that didn't fit),
      is_overflow: bool[E].
    """
    e = body_a.shape[0]
    edge_idx = jnp.arange(e, dtype=jnp.int32)
    big = jnp.asarray(e + 1, jnp.int32)

    color = jnp.full((e,), max_colors - 1, jnp.int32)
    uncolored = edge_mask

    for c in range(max_colors - 1):
        body_used = jnp.zeros((n_bodies,), bool)
        for _ in range(_INNER_ROUNDS):
            # Candidate edges: still uncolored, endpoints unused this color.
            cand = (
                uncolored
                & ~(dyn_a & body_used[body_a])
                & ~(dyn_b & body_used[body_b])
            )
            key = jnp.where(cand, edge_idx, big)
            # Min edge index per body (only dynamic endpoints conflict).
            min_a = jnp.full((n_bodies,), big).at[body_a].min(
                jnp.where(dyn_a, key, big)
            )
            min_b = jnp.full((n_bodies,), big).at[body_b].min(
                jnp.where(dyn_b, key, big)
            )
            min_inc = jnp.minimum(min_a, min_b)
            sel = cand & (
                (~dyn_a | (min_inc[body_a] == edge_idx))
                & (~dyn_b | (min_inc[body_b] == edge_idx))
            )
            color = jnp.where(sel, c, color)
            uncolored = uncolored & ~sel
            body_used = (
                body_used.at[body_a].max(sel & dyn_a).at[body_b].max(sel & dyn_b)
            )

    is_overflow = uncolored
    return color, is_overflow
