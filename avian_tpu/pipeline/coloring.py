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

import jax
import jax.numpy as jnp

_INNER_ROUNDS = 3  # MIS refinement rounds per color


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

    # Fold both endpoints into one [2E] incidence so each MIS round costs a
    # single scatter-min / gather / scatter-max instead of two of each.
    bodies2 = jnp.concatenate([body_a, body_b])
    dyn2 = jnp.concatenate([dyn_a, dyn_b])
    edge2 = jnp.concatenate([edge_idx, edge_idx])

    def round_body(r, state):
        color, uncolored, body_used = state
        c = r // _INNER_ROUNDS
        is_new_color = (r % _INNER_ROUNDS) == 0
        body_used = jnp.where(is_new_color, jnp.zeros_like(body_used), body_used)

        used2 = dyn2 & body_used[bodies2]
        # Candidate edges: still uncolored, endpoints unused this color.
        cand = uncolored & ~used2[:e] & ~used2[e:]
        key2 = jnp.where(
            jnp.concatenate([cand, cand]) & dyn2, edge2, big
        )
        min_inc = jnp.full((n_bodies,), big).at[bodies2].min(key2)
        ok2 = ~dyn2 | (min_inc[bodies2] == edge2)
        sel = cand & ok2[:e] & ok2[e:]
        color = jnp.where(sel, c, color)
        uncolored = uncolored & ~sel
        body_used = body_used.at[bodies2].max(
            jnp.concatenate([sel, sel]) & dyn2
        )
        return color, uncolored, body_used

    color = jnp.full((e,), max_colors - 1, jnp.int32)
    color, uncolored, _ = jax.lax.fori_loop(
        0,
        (max_colors - 1) * _INNER_ROUNDS,
        round_body,
        (color, edge_mask, jnp.zeros((n_bodies,), bool)),
    )
    return color, uncolored
