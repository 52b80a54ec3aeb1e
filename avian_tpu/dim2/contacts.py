"""2D narrowphase driver: persistent pair matching + warm-start carry.

2D profile of ``avian_tpu/pipeline/contacts.py`` (same design vs the
reference's ``NarrowPhase::update``, ``system_param.rs:114,437-830``);
manifolds come from the rounded-polygon kernel, <= 2 points per pair.
"""

import jax
import jax.numpy as jnp

from avian_tpu.core.config import PhysicsConfig
from avian_tpu.dim2.broadphase import BroadPhaseResult2D, update_collider_poses
from avian_tpu.dim2.narrowphase import compute_manifold_2d, rot, rotate
from avian_tpu.dim2.state import Contacts2D, MAX_POINTS_2D, World2D
from avian_tpu.pipeline.contacts import _combine


def narrow_phase(
    world: World2D, bp: BroadPhaseResult2D, config: PhysicsConfig
) -> Contacts2D:
    old = world.contacts
    col = world.colliders
    b = world.bodies
    c_cap = old.capacity

    ca, cb = bp.collider_a, bp.collider_b
    ba = col.body_idx[ca]
    bb = col.body_idx[cb]

    # ---- manifolds -----------------------------------------------------
    pos, angle = update_collider_poses(world)
    manifolds = jax.vmap(compute_manifold_2d)(
        pos[ca], angle[ca], col.poly_verts[ca], col.vert_count[ca],
        col.radius[ca], col.is_plane[ca],
        pos[cb], angle[cb], col.poly_verts[cb], col.vert_count[cb],
        col.radius[cb], col.is_plane[cb],
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

    point_in_range = manifolds.separation < keep_dist[:, None]
    point_idx_ok = (
        jnp.arange(MAX_POINTS_2D)[None, :] < manifolds.count[:, None]
    )
    point_valid = point_in_range & point_idx_ok & bp.valid[:, None]

    order = jnp.argsort(~point_valid, axis=1, stable=True)
    take = lambda arr: jnp.take_along_axis(arr, order, axis=1)
    sep = take(manifolds.separation)
    fid = take(manifolds.feature_id)
    p_a = jnp.take_along_axis(manifolds.point_a, order[..., None], axis=1)
    p_b = jnp.take_along_axis(manifolds.point_b, order[..., None], axis=1)
    num_points = jnp.sum(point_valid.astype(jnp.int32), axis=1)
    touching = (num_points > 0) & bp.valid

    # Anchors from each body's world COM, fixed over the substep loop.
    c_a, s_a = rot(b.angle[ba])
    c_b, s_b = rot(b.angle[bb])
    com_a = b.pos[ba] + rotate(c_a, s_a, b.com[ba])
    com_b = b.pos[bb] + rotate(c_b, s_b, b.com[bb])
    anchor_a = p_a - com_a[:, None, :]
    anchor_b = p_b - com_b[:, None, :]

    # ---- pair persistence ----------------------------------------------
    # Sort-merge join: one stable sort of [old keys ++ new keys] answers
    # both the persistence match and the eviction reverse-match (see the
    # 3D twin in pipeline/contacts.py; replaces two ~17-round searchsorted
    # chains at ~0.25-0.5 ms per dependent gather round).
    karr = jnp.concatenate([old.pair_key, bp.pair_key])
    s = jnp.argsort(karr, stable=True).astype(jnp.int32)
    ks = karr[s]
    key_ok = ks >= 0
    same_prev = jnp.concatenate([jnp.zeros((1,), bool), ks[1:] == ks[:-1]])
    tag_s = s >= c_cap            # True = new entry
    src_s = jnp.where(tag_s, s - c_cap, s)
    prev_old = jnp.concatenate([jnp.zeros((1,), bool), ~tag_s[:-1]])
    m_new = tag_s & same_prev & prev_old & key_ok
    prev_src = jnp.concatenate([jnp.zeros((1,), jnp.int32), src_s[:-1]])
    hit = (
        jnp.zeros((c_cap,), jnp.int32)
        .at[jnp.where(tag_s, src_s, c_cap)]
        .set(jnp.where(m_new, prev_src + 1, 0), mode="drop")
    )
    matched = hit > 0
    old_slot = jnp.maximum(hit - 1, 0)

    was_touching = jnp.where(matched, old.touching[old_slot], False)
    carried_color = jnp.where(matched, old.color[old_slot], -1)

    is_new = bp.valid & ~matched
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    contact_id = jnp.where(
        matched,
        old.contact_id[old_slot],
        jnp.where(is_new, old.next_contact_id + new_rank, 0),
    )
    next_contact_id = old.next_contact_id + jnp.sum(is_new.astype(jnp.int32))

    # ---- per-point warm-start matching ----------------------------------
    old_fid = old.feature_id[old_slot]
    old_anchor = old.anchor_a[old_slot]
    old_np = old.normal_impulse[old_slot]
    old_tp = old.tangent_impulse[old_slot]
    old_valid = (
        jnp.arange(MAX_POINTS_2D)[None, :]
        < old.num_points[old_slot][:, None]
    ) & matched[:, None]

    fid_match = (
        fid[:, :, None] == old_fid[:, None, :]
    ) & old_valid[:, None, :]
    d2 = jnp.sum(
        (anchor_a[:, :, None, :] - old_anchor[:, None, :, :]) ** 2, axis=-1
    )
    dist_thresh = (
        config.narrow_phase.match_distance * config.length_unit
    ) ** 2
    dist_match = (d2 < dist_thresh) & old_valid[:, None, :]
    use_match = jnp.where(
        jnp.any(fid_match, axis=-1, keepdims=True), fid_match, dist_match
    )
    score = jnp.where(use_match, -d2, -jnp.inf)
    best = jnp.argmax(score, axis=-1)
    has_match = jnp.any(use_match, axis=-1) & (
        jnp.asarray(config.narrow_phase.match_contacts)
    )
    gather_p = lambda arr: jnp.take_along_axis(arr, best, axis=1)
    warm_np = jnp.where(has_match, gather_p(old_np), 0.0)
    warm_tp = jnp.where(has_match, gather_p(old_tp), 0.0)

    # ---- materials -------------------------------------------------------
    friction = _combine(
        col.friction[ca], col.friction[cb],
        col.friction_combine[ca], col.friction_combine[cb],
    )
    static_friction = _combine(
        col.static_friction[ca], col.static_friction[cb],
        col.friction_combine[ca], col.friction_combine[cb],
    )
    restitution = _combine(
        col.restitution[ca], col.restitution[cb],
        col.restitution_combine[ca], col.restitution_combine[cb],
    )
    is_sensor = col.is_sensor[ca] | col.is_sensor[cb]

    # ---- CollisionEnd on eviction ---------------------------------------
    # Rides the persistence join's sorted array: an old entry survives iff
    # the next entry is a new entry with the same key.
    next_same = jnp.concatenate([same_prev[1:], jnp.zeros((1,), bool)])
    next_new = jnp.concatenate([tag_s[1:], jnp.zeros((1,), bool)])
    m_old_survives = ~tag_s & next_same & next_new & key_ok
    survives = (
        jnp.zeros((c_cap,), bool)
        .at[jnp.where(~tag_s, src_s, c_cap)]
        .set(m_old_survives, mode="drop")
    )
    evicted = old.active & old.touching & ~survives

    return Contacts2D(
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
        surface_speed=jnp.zeros((c_cap,), jnp.float32),
        color=carried_color,
        contact_id=contact_id,
        next_contact_id=next_contact_id,
        evicted=evicted,
        evicted_contact_id=jnp.where(evicted, old.contact_id, 0),
        evicted_body_a=jnp.where(evicted, old.body_a, 0),
        evicted_body_b=jnp.where(evicted, old.body_b, 0),
    )
