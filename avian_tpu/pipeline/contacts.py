"""Narrowphase driver: persistent pair matching, manifolds, warm-start carry.

Mirrors the reference's ``NarrowPhase::update``
(``src/collision/narrow_phase/system_param.rs:114,437-830``):

- match this step's broadphase pairs against the previous step's persistent
  contact buffer by pair key (the graph's ``PairKey`` lookup becomes a
  sorted-key binary search over the old buffer),
- compute fresh manifolds per pair (``geometry.narrowphase``),
- per-point contact matching by feature id, falling back to anchor distance
  (``contact_types/mod.rs:426-472``), carrying warm-start impulses,
- apply the speculative-margin keep predicate
  (``system_param.rs:663-756``),
- combine materials (``physics_material.rs:13-46``).
"""

import jax
import jax.numpy as jnp

from avian_tpu.core import types
from avian_tpu.core.config import PhysicsConfig
from avian_tpu.core.state import Contacts, World, MAX_POINTS
from avian_tpu.geometry.narrowphase import compute_manifold
from avian_tpu.math import quat as quat_m
from avian_tpu.pipeline.broadphase import (
    KEY_M_MAX,
    BroadPhaseResult,
    update_collider_poses,
)


def _combine(val_a, val_b, rule_a, rule_b):
    """CoefficientCombine with higher-priority rule winning
    (``physics_material.rs:13-46``)."""
    rule = jnp.maximum(rule_a, rule_b)
    avg = 0.5 * (val_a + val_b)
    geo = jnp.sqrt(jnp.maximum(val_a * val_b, 0.0))
    mn = jnp.minimum(val_a, val_b)
    mul = val_a * val_b
    mx = jnp.maximum(val_a, val_b)
    return jnp.select(
        [
            rule == types.CoefficientCombine.AVERAGE,
            rule == types.CoefficientCombine.GEOMETRIC_MEAN,
            rule == types.CoefficientCombine.MIN,
            rule == types.CoefficientCombine.MULTIPLY,
            rule == types.CoefficientCombine.MAX,
        ],
        [avg, geo, mn, mul, mx],
        default=avg,
    )


def narrow_phase(
    world: World, bp: BroadPhaseResult, config: PhysicsConfig,
    custom_shapes=(),
) -> Contacts:
    """Build this step's Contacts buffer from broadphase pairs + old buffer."""
    old = world.contacts
    col = world.colliders
    b = world.bodies
    c_cap = old.capacity
    custom_shapes = custom_shapes if custom_shapes else world.custom_shapes

    ca, cb = bp.collider_a, bp.collider_b
    ba = col.body_idx[ca]
    bb = col.body_idx[cb]

    # ---- manifolds -----------------------------------------------------
    pos, quat = update_collider_poses(world)
    # Static branch pruning: an explicit config hint wins; otherwise use
    # the scene's own shape-pair set derived by the builder.
    pairs = (
        config.shape_pairs
        if config.shape_pairs is not None
        else world.shape_pairs
    )
    manifolds = jax.vmap(
        lambda *args: compute_manifold(
            *args, shape_pairs=pairs, convex_verts=world.convex_verts,
            custom_shapes=custom_shapes,
        )
    )(
        col.shape_type[ca], pos[ca], quat[ca], col.params[ca],
        col.shape_type[cb], pos[cb], quat[cb], col.params[cb],
    )

    # ---- effective speculative margin (system_param.rs:663-682) --------
    dt = config.dt
    spec_default = config.narrow_phase.default_speculative_margin

    def clamped_vel(body_idx, collider_idx):
        v = b.lin_vel[body_idx]
        spec = jnp.minimum(col.speculative_margin[collider_idx], spec_default)
        speed = jnp.linalg.norm(v, axis=-1)
        scale = jnp.minimum(1.0, spec / jnp.maximum(speed * dt, 1e-9))
        return v * scale[:, None]

    v_rel = clamped_vel(bb, cb) - clamped_vel(ba, ca)
    margin = dt * jnp.linalg.norm(v_rel, axis=-1)
    tol = config.narrow_phase.contact_tolerance * config.length_unit
    keep_dist = (
        jnp.maximum(margin, tol)
        + col.collision_margin[ca]
        + col.collision_margin[cb]
    )

    # Keep points within the speculative distance (system_param.rs:753-756).
    point_in_range = manifolds.separation < keep_dist[:, None]
    point_idx_ok = (
        jnp.arange(MAX_POINTS)[None, :] < manifolds.count[:, None]
    )
    point_valid = point_in_range & point_idx_ok & bp.valid[:, None]

    # Compact valid points to the front of each manifold (so the
    # "first num_points" invariant holds downstream).
    order = jnp.argsort(~point_valid, axis=1, stable=True)
    take = lambda arr: jnp.take_along_axis(arr, order, axis=1)
    sep = take(manifolds.separation)
    fid = take(manifolds.feature_id)
    p_a = jnp.take_along_axis(manifolds.point_a, order[..., None], axis=1)
    p_b = jnp.take_along_axis(manifolds.point_b, order[..., None], axis=1)
    num_points = jnp.sum(point_valid.astype(jnp.int32), axis=1)
    touching = (num_points > 0) & bp.valid

    # Anchors relative to each body's world COM, fixed for the substep loop
    # (``contact/mod.rs:167-170``).
    com_a = b.pos[ba] + quat_m.rotate(b.quat[ba], b.com[ba])
    com_b = b.pos[bb] + quat_m.rotate(b.quat[bb], b.com[bb])
    anchor_a = p_a - com_a[:, None, :]
    anchor_b = p_b - com_b[:, None, :]

    # ---- pair-level persistence (warm-start carry) ----------------------
    # Sort-merge join (round 5): ONE stable sort of [old keys ++ new keys]
    # answers BOTH directions — each new pair's old slot (old entry sorts
    # immediately before its equal new key: stable sort keeps old-first)
    # and each old pair's survival (a new entry follows it). This replaces
    # two ~17-round searchsorted binary-search chains: on this runtime
    # every dependent gather round costs ~0.25-0.5 ms regardless of size
    # (BASELINE.md round-5 cost model), so a 4-memop merge beats a
    # 34-round search by ~10 ms/step. Beyond KEY_M_MAX colliders the
    # packed i32 key is not injective, so keys go lexicographic (lo, hi).
    if world.colliders.capacity > KEY_M_MAX:
        sent = jnp.iinfo(jnp.int32).max
        old_lo = jnp.minimum(old.collider_a, old.collider_b)
        old_hi = jnp.maximum(old.collider_a, old.collider_b)
        old_lo = jnp.where(old.active, old_lo, sent)
        old_hi = jnp.where(old.active, old_hi, sent)
        new_lo = jnp.where(bp.valid, jnp.minimum(ca, cb), sent)
        new_hi = jnp.where(bp.valid, jnp.maximum(ca, cb), sent)
        lo_all = jnp.concatenate([old_lo, new_lo])
        hi_all = jnp.concatenate([old_hi, new_hi])
        # lexsort is stable, so old entries (first half) precede new ones
        # with equal (lo, hi); invalid keys are the +inf sentinel.
        s = jnp.lexsort((jnp.arange(2 * c_cap), hi_all, lo_all)).astype(
            jnp.int32
        )
        ks_lo = lo_all[s]
        ks_hi = hi_all[s]
        key_ok = ks_lo != sent
        same_prev = jnp.concatenate(
            [
                jnp.zeros((1,), bool),
                (ks_lo[1:] == ks_lo[:-1]) & (ks_hi[1:] == ks_hi[:-1]),
            ]
        )
    else:
        karr = jnp.concatenate([old.pair_key, bp.pair_key])
        s = jnp.argsort(karr, stable=True).astype(jnp.int32)
        ks = karr[s]
        key_ok = ks >= 0
        same_prev = jnp.concatenate(
            [jnp.zeros((1,), bool), ks[1:] == ks[:-1]]
        )
    tag_s = s >= c_cap            # True = new entry
    src_s = jnp.where(tag_s, s - c_cap, s)
    prev_old = jnp.concatenate([jnp.zeros((1,), bool), ~tag_s[:-1]])
    m_new = tag_s & same_prev & prev_old & key_ok
    prev_src = jnp.concatenate([jnp.zeros((1,), jnp.int32), src_s[:-1]])
    # Scatter (old_slot + 1) back to new-pair order; 0 = unmatched.
    hit = (
        jnp.zeros((c_cap,), jnp.int32)
        .at[jnp.where(tag_s, src_s, c_cap)]
        .set(jnp.where(m_new, prev_src + 1, 0), mode="drop")
    )
    matched = hit > 0
    old_slot = jnp.maximum(hit - 1, 0)

    was_touching = jnp.where(matched, old.touching[old_slot], False)
    carried_color = jnp.where(matched, old.color[old_slot], -1)

    # Stable contact ids (the reference's ContactEdge ids): carry matched
    # pairs' ids; mint fresh ids for newly-entered pairs.
    is_new = bp.valid & ~matched
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    contact_id = jnp.where(
        matched,
        old.contact_id[old_slot],
        jnp.where(is_new, old.next_contact_id + new_rank, 0),
    )
    next_contact_id = old.next_contact_id + jnp.sum(is_new.astype(jnp.int32))

    # ---- per-point warm-start matching ----------------------------------
    # For each new point, find an old point with the same feature id; fall
    # back to anchor-distance matching (contact_types/mod.rs:426-472).
    old_fid = old.feature_id[old_slot]          # [C, P]
    old_anchor = old.anchor_a[old_slot]         # [C, P, 3]
    old_np = old.normal_impulse[old_slot]       # [C, P]
    old_tp = old.tangent_impulse[old_slot]      # [C, P, 2]
    old_valid = (
        jnp.arange(MAX_POINTS)[None, :] < old.num_points[old_slot][:, None]
    ) & matched[:, None]

    fid_match = (fid[:, :, None] == old_fid[:, None, :]) & old_valid[:, None, :]
    d2 = jnp.sum(
        (anchor_a[:, :, None, :] - old_anchor[:, None, :, :]) ** 2, axis=-1
    )
    dist_thresh = (config.narrow_phase.match_distance * config.length_unit) ** 2
    dist_match = (d2 < dist_thresh) & old_valid[:, None, :]
    use_match = jnp.where(
        jnp.any(fid_match, axis=-1, keepdims=True), fid_match, dist_match
    )
    # Pick the first matching old point (deterministic).
    score = jnp.where(use_match, -d2, -jnp.inf)
    best = jnp.argmax(score, axis=-1)
    has_match = jnp.any(use_match, axis=-1) & (
        jnp.asarray(config.narrow_phase.match_contacts)
    )
    gather_p = lambda arr: jnp.take_along_axis(arr, best, axis=1)
    warm_np = jnp.where(has_match, gather_p(old_np), 0.0)
    warm_tp = jnp.where(
        has_match[..., None],
        jnp.take_along_axis(old_tp, best[..., None], axis=1),
        0.0,
    )

    # ---- materials -------------------------------------------------------
    friction = _combine(
        col.friction[ca], col.friction[cb],
        col.friction_combine[ca], col.friction_combine[cb],
    )
    # Static coefficient combined independently with the same rule
    # (``physics_material.rs:208-212``); used by the solver's stiction
    # branch when the tangential speed is below threshold.
    static_friction = _combine(
        col.static_friction[ca], col.static_friction[cb],
        col.friction_combine[ca], col.friction_combine[cb],
    )
    restitution = _combine(
        col.restitution[ca], col.restitution[cb],
        col.restitution_combine[ca], col.restitution_combine[cb],
    )

    is_sensor = col.is_sensor[ca] | col.is_sensor[cb]

    # ---- CollisionEnd on eviction (collision_events.rs:256) -------------
    # Old pairs that were touching but got no slot this step (AABBs
    # separated -> broadphase emitted nothing) would otherwise silently
    # never fire their end event. The eviction reverse-match rides the
    # SAME sorted array as the persistence join above: an old entry is
    # still tracked iff the entry after it is a new entry with the same
    # key (stable sort: old precedes its equal new key). One extra
    # scatter; zero extra sorts or search rounds.
    next_same = jnp.concatenate([same_prev[1:], jnp.zeros((1,), bool)])
    next_new = jnp.concatenate([tag_s[1:], jnp.zeros((1,), bool)])
    m_old_survives = ~tag_s & next_same & next_new & key_ok
    survives = (
        jnp.zeros((c_cap,), bool)
        .at[jnp.where(~tag_s, src_s, c_cap)]
        .set(m_old_survives, mode="drop")
    )
    evicted = old.active & old.touching & ~survives
    evicted_contact_id = jnp.where(evicted, old.contact_id, 0)
    evicted_body_a = jnp.where(evicted, old.body_a, 0)
    evicted_body_b = jnp.where(evicted, old.body_b, 0)

    return Contacts(
        pair_key=bp.pair_key,
        collider_a=ca,
        collider_b=cb,
        body_a=ba,
        body_b=bb,
        active=bp.valid,
        touching=touching,
        was_touching=was_touching,
        is_sensor=is_sensor,
        normal=manifolds.normal,
        num_points=num_points,
        anchor_a=anchor_a,
        anchor_b=anchor_b,
        penetration=-sep,
        feature_id=fid,
        normal_impulse=warm_np,
        tangent_impulse=warm_tp,
        max_normal_impulse=jnp.zeros_like(warm_np),
        friction=friction,
        static_friction=static_friction,
        restitution=restitution,
        surface_velocity=jnp.zeros((c_cap, 3), jnp.float32),
        color=carried_color,
        contact_id=contact_id,
        next_contact_id=next_contact_id,
        evicted=evicted,
        evicted_contact_id=evicted_contact_id,
        evicted_body_a=evicted_body_a,
        evicted_body_b=evicted_body_b,
    )
