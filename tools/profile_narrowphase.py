"""Sub-stage slope profile of pipeline/contacts.py::narrow_phase (+ the
prepare stage) on the real device, in the steady-state 10k-pile context.
Same protocol as profile_broadphase.py: forced-D2H slope over two scan
lengths, cut-points as cumulative prefixes of the real dataflow.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avian_tpu.utils.cache import enable as enable_cache

enable_cache()

import jax
import jax.numpy as jnp

from avian_tpu import PhysicsConfig
from avian_tpu.core.types import ShapeType
from avian_tpu.core.state import MAX_POINTS
from avian_tpu.geometry.narrowphase import compute_manifold
from avian_tpu.math import quat as quat_m
from avian_tpu.pipeline import broadphase as bp_m
from avian_tpu.pipeline import contacts as np_m
from avian_tpu.pipeline import solver as sol_m
from avian_tpu.pipeline import solver_body as sb_m
from avian_tpu.pipeline.coloring import color_constraints
from avian_tpu.pipeline.step import physics_step
from avian_tpu.scenes import cube_pile

N = int(os.environ.get("BENCH_CUBES", "10000"))
K1 = int(os.environ.get("PROF_K1", "4"))
K2 = int(os.environ.get("PROF_K2", "16"))

config = PhysicsConfig(
    substeps=4,
    shape_pairs=(
        (ShapeType.BOX, ShapeType.BOX),
        (ShapeType.BOX, ShapeType.PLANE),
    ),
)

CUTS = [
    "manifolds",      # 0 collider gathers + poses + manifold kernels
    "keep+compact",   # 1 speculative keep + per-manifold point compaction
    "pair_match",     # 2 sort-merge persistence join
    "point_match",    # 3 feature-id/distance warm-start matching
    "np_rest",        # 4 materials + eviction + assemble (full narrow_phase)
    "prep_colors",    # 5 coloring
    "prep_bucketize", # 6 bucketize + relax
    "prep_full",      # 7 full prepare_constraints
]


def np_prefix(world, bp, upto):
    old = world.contacts
    col = world.colliders
    b = world.bodies
    acc = jnp.zeros((), jnp.float32)

    ca, cb = bp.collider_a, bp.collider_b
    pos, quat = bp_m.update_collider_poses(world)
    manifolds = jax.vmap(
        lambda *args: compute_manifold(
            *args, shape_pairs=config.shape_pairs,
            convex_verts=world.convex_verts, custom_shapes=(),
        )
    )(
        col.shape_type[ca], pos[ca], quat[ca], col.params[ca],
        col.shape_type[cb], pos[cb], quat[cb], col.params[cb],
    )
    acc += jnp.sum(manifolds.separation * 1e-9) + jnp.sum(
        manifolds.normal[:, 0] * 1e-9
    )
    if upto == 0:
        return acc

    ba = col.body_idx[ca]
    bb = col.body_idx[cb]
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
    point_idx_ok = jnp.arange(MAX_POINTS)[None, :] < manifolds.count[:, None]
    point_valid = point_in_range & point_idx_ok & bp.valid[:, None]
    order = jnp.argsort(~point_valid, axis=1, stable=True)
    sep = jnp.take_along_axis(manifolds.separation, order, axis=1)
    num_points = jnp.sum(point_valid.astype(jnp.int32), axis=1)
    acc += jnp.sum(sep * 1e-9) + jnp.sum(num_points).astype(jnp.float32)
    if upto == 1:
        return acc

    c_cap = old.capacity
    karr = jnp.concatenate([old.pair_key, bp.pair_key])
    s = jnp.argsort(karr, stable=True).astype(jnp.int32)
    ks = karr[s]
    key_ok = ks >= 0
    same_prev = jnp.concatenate([jnp.zeros((1,), bool), ks[1:] == ks[:-1]])
    tag_s = s >= c_cap
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
    acc += jnp.sum(matched.astype(jnp.float32)) + jnp.sum(
        old_slot.astype(jnp.float32) * 1e-9
    )
    if upto == 2:
        return acc

    fid = jnp.take_along_axis(manifolds.feature_id, order, axis=1)
    p_a = jnp.take_along_axis(manifolds.point_a, order[..., None], axis=1)
    com_a = b.pos[ba] + quat_m.rotate(b.quat[ba], b.com[ba])
    anchor_a = p_a - com_a[:, None, :]
    old_fid = old.feature_id[old_slot]
    old_anchor = old.anchor_a[old_slot]
    old_np = old.normal_impulse[old_slot]
    old_valid = (
        jnp.arange(MAX_POINTS)[None, :] < old.num_points[old_slot][:, None]
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
    warm_np = jnp.take_along_axis(old_np, best, axis=1)
    acc += jnp.sum(warm_np * 1e-9)
    if upto == 3:
        return acc

    contacts = np_m.narrow_phase(world, bp, config, ())
    acc += (
        jnp.sum(contacts.penetration * 1e-9)
        + jnp.sum(contacts.normal_impulse * 1e-9)
        + jnp.sum(contacts.touching.astype(jnp.float32))
        + jnp.sum(contacts.evicted.astype(jnp.float32))
    )
    if upto == 4:
        return acc

    s_b = sb_m.prepare(world.bodies)
    dyn_a = s_b.solve_mask[contacts.body_a] > 0.0
    dyn_b = s_b.solve_mask[contacts.body_b] > 0.0
    solve = (
        contacts.active & contacts.touching & ~contacts.is_sensor
        & (dyn_a | dyn_b)
    )
    color, _ovf = color_constraints(
        contacts.body_a, contacts.body_b, dyn_a, dyn_b, solve,
        world.bodies.capacity, config.max_colors, prev_color=contacts.color,
    )
    acc += jnp.sum(color.astype(jnp.float32) * 1e-9)
    if upto == 5:
        return acc

    cap = max(
        1,
        int(config.color_bucket_factor * c_cap + config.max_colors - 1)
        // config.max_colors,
    )
    buckets, bucket_valid, dropped = sol_m._bucketize(
        color, solve, config.max_colors, cap
    )
    acc += (
        jnp.sum(buckets.astype(jnp.float32) * 1e-9)
        + dropped.astype(jnp.float32)
    )
    if upto == 6:
        return acc

    con = sol_m.prepare_constraints(world, contacts, s_b, config)
    acc += jnp.sum(con.data * 1e-12) + jnp.sum(con.imp * 1e-12)
    return acc


def forced(fn, w):
    t0 = time.perf_counter()
    out = fn(w)
    _ = float(out.bodies.pos[0, 0])
    return time.perf_counter() - t0


def main():
    world, _ = cube_pile(n_cubes=N, max_contacts=8 * N)
    step = jax.jit(lambda w: physics_step(w, config))
    world = step(world)
    jax.block_until_ready(world.bodies.pos)
    for _ in range(60):
        world = step(world)
    _ = float(world.bodies.pos[0, 0])
    print(f"device={jax.devices()[0]} N={N} K1={K1} K2={K2}", flush=True)

    def make(upto, k):
        @jax.jit
        def many(w):
            def body(w_, _):
                w2 = bp_m.update_aabbs(w_, config)
                bp = bp_m.broad_phase(w2, config)
                acc = np_prefix(w2, bp, upto)
                bz = w_.bodies.replace(
                    pos=w_.bodies.pos + acc * jnp.float32(1e-38)
                )
                return w_.replace(bodies=bz, time=w_.time + 1.0 / 60.0), None
            return jax.lax.scan(body, w, None, length=k)[0]
        return many

    prev = 0.0
    for upto in range(len(CUTS)):
        f1, f2 = make(upto, K1), make(upto, K2)
        forced(f1, world)
        forced(f2, world)
        t1, t2 = forced(f1, world), forced(f2, world)
        ms = (t2 - t1) / (K2 - K1) * 1e3
        print(
            f"{CUTS[upto]:>16}: cum {ms:8.3f} ms  delta {ms - prev:8.3f} ms",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
