"""Sub-stage slope profile of pipeline/broadphase.py::broad_phase on the
real device, in the exact steady-state context of the 10k pile (all
operands loop-carried through the scan, like the real step). Finds which
internal op owns the 291 ms/step the stage profiler measured.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avian_tpu.utils.cache import enable as enable_cache

enable_cache()

import jax
import jax.numpy as jnp
import numpy as _np

from avian_tpu import PhysicsConfig
from avian_tpu.core import types
from avian_tpu.core.types import ShapeType
from avian_tpu.geometry import shapes
from avian_tpu.pipeline import broadphase as bp_m
from avian_tpu.pipeline.broadphase import _CELL_OFFSETS, KEY_M_MAX, MAX_GLOBALS
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
    "entries+ckey",      # 0 cell ids, packed keys (elementwise)
    "sort",              # 1 argsort + skey/scol
    "window_gathers",    # 2 jdx gathers: scol[jdx], skey[jdx]
    "overlap",           # 3 aabb gathers at win_a/win_b + overlap test
    "canonical+ok",      # 4 canonical-cell emission + run-overflow detect
    "global_pass",       # 5 dense pass vs planes
    "pair_filters",      # 6 layer/body/joint filters (2.7M-row gathers)
    "compaction",        # 7 cumsum + 3 scatters
]


def bp_prefix(world, upto):
    """Inline re-statement of broad_phase with cut-points; returns a
    scalar that data-depends on everything computed so far."""
    col = world.colliders
    m = col.capacity
    c_cap = world.contacts.capacity
    w = min(config.sap_window, max(m - 1, 1))
    acc = jnp.zeros((), jnp.float32)

    ext_c = jnp.max(col.aabb_max - col.aabb_min, axis=-1)
    is_plane = ext_c > shapes.BIG
    finite = col.active & ~is_plane
    n_finite = jnp.sum(finite.astype(jnp.int32))
    ext_sorted = jnp.sort(jnp.where(finite, ext_c, jnp.inf))
    median_ext = ext_sorted[jnp.clip(n_finite // 2, 0, ext_c.shape[0] - 1)]
    is_big = finite & (ext_c > 4.0 * jnp.maximum(median_ext, 1e-6))
    is_global = is_plane | is_big
    in_sweep = col.active & ~is_global

    ext_axis = col.aabb_max - col.aabb_min
    cell = 1.001 * jnp.maximum(
        jnp.max(jnp.where(in_sweep[:, None], ext_axis, 0.0)), 1e-3
    )
    i0 = jnp.floor(col.aabb_min / cell).astype(jnp.int32)
    i1 = jnp.floor(col.aabb_max / cell).astype(jnp.int32)
    cc = i0[:, None, :] + jnp.asarray(_CELL_OFFSETS)[None, :, :]
    entry_ok = jnp.all(cc <= i1[:, None, :], axis=-1) & in_sweep[:, None]
    ckey = (
        ((cc[..., 0] & 1023) << 20)
        | ((cc[..., 1] & 1023) << 10)
        | (cc[..., 2] & 1023)
    )
    sentinel = jnp.iinfo(jnp.int32).max
    ckey = jnp.where(entry_ok, ckey, sentinel)
    acc += jnp.sum(ckey.astype(jnp.float32) * 1e-9)
    if upto == 0:
        return acc

    order = jnp.argsort(ckey.reshape(-1), stable=True)
    skey = ckey.reshape(-1)[order]
    scol = (order // 8).astype(jnp.int32)
    n_e = 8 * m
    acc += jnp.sum(skey.astype(jnp.float32) * 1e-9) + scol[0].astype(
        jnp.float32
    )
    if upto == 1:
        return acc

    i2 = jnp.arange(n_e)[:, None]
    k2 = jnp.arange(1, w + 1)[None, :]
    jdx = jnp.minimum(i2 + k2, n_e - 1)
    win_a = jnp.broadcast_to(scol[:, None], (n_e, w))
    win_b = scol[jdx]
    same_cell = (skey[jdx] == skey[:, None]) & (skey[:, None] != sentinel)
    acc += jnp.sum(same_cell.astype(jnp.float32)) + jnp.sum(
        win_b[::4096, :].astype(jnp.float32) * 1e-9
    )
    if upto == 2:
        return acc

    overlap = jnp.all(
        (col.aabb_min[win_b] <= col.aabb_max[win_a])
        & (col.aabb_min[win_a] <= col.aabb_max[win_b]),
        axis=-1,
    )
    acc += jnp.sum(overlap.astype(jnp.float32))
    if upto == 3:
        return acc

    canon = jnp.maximum(i0[win_a], i0[win_b])
    canon_key = (
        ((canon[..., 0] & 1023) << 20)
        | ((canon[..., 1] & 1023) << 10)
        | (canon[..., 2] & 1023)
    )
    win_ok = (
        (i2 + k2 < n_e)
        & same_cell
        & (win_a != win_b)
        & overlap
        & (canon_key == skey[:, None])
    )
    new_run = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    run_start = jax.lax.cummax(jnp.where(new_run, jnp.arange(n_e), 0))
    rank = jnp.arange(n_e) - run_start
    window_overflow = jnp.sum(((rank > w) & (skey != sentinel)).astype(jnp.int32))
    acc += jnp.sum(win_ok.astype(jnp.float32)) + window_overflow.astype(
        jnp.float32
    )
    if upto == 4:
        return acc

    g_cap = min(MAX_GLOBALS, m)
    g_score = jnp.where(is_global & col.active, 1, 0)
    g_idx = jnp.argsort(-g_score)[:g_cap]
    g_valid = g_score[g_idx] > 0
    global_overflow = jnp.maximum(jnp.sum(g_score) - g_cap, 0)
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
        & (~is_global[None, :] | (glob_a < glob_b))
        & g_aabb_overlap
    )
    ca = jnp.concatenate([win_a.reshape(-1), glob_a.reshape(-1)])
    cb = jnp.concatenate([win_b.reshape(-1), glob_b.reshape(-1)])
    ok = jnp.concatenate([win_ok.reshape(-1), glob_ok.reshape(-1)])
    acc += jnp.sum(glob_ok.astype(jnp.float32)) + global_overflow.astype(
        jnp.float32
    )
    if upto == 5:
        return acc

    ok = ok & bp_m._pair_filters(world, ca, cb)
    acc += jnp.sum(ok.astype(jnp.float32))
    if upto == 6:
        return acc

    lo = jnp.minimum(ca, cb)
    hi = jnp.maximum(ca, cb)
    key = lo * m + hi if m <= KEY_M_MAX else jnp.zeros_like(lo)
    slot_end = jnp.cumsum(ok.astype(jnp.int32))
    total_valid = slot_end[-1]
    slot = jnp.where(ok, slot_end - 1, c_cap)
    a_f = jnp.zeros((c_cap,), jnp.int32).at[slot].set(
        jnp.asarray(ca, jnp.int32), mode="drop"
    )
    b_f = jnp.zeros((c_cap,), jnp.int32).at[slot].set(
        jnp.asarray(cb, jnp.int32), mode="drop"
    )
    key_f = jnp.full((c_cap,), -1, jnp.int32).at[slot].set(
        key.astype(jnp.int32), mode="drop"
    )
    acc += (
        jnp.sum(a_f.astype(jnp.float32) * 1e-9)
        + jnp.sum(b_f.astype(jnp.float32) * 1e-9)
        + jnp.sum(key_f.astype(jnp.float32) * 1e-9)
        + total_valid.astype(jnp.float32)
    )
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
    _ = float(world.bodies.pos[0, 0])  # settle + enter degraded mode
    print(f"device={jax.devices()[0]} N={N} K1={K1} K2={K2}", flush=True)

    def make(upto, k):
        @jax.jit
        def many(w):
            def body(w_, _):
                # chain: aabbs + broadphase prefix, fold acc into pos
                w2 = bp_m.update_aabbs(w_, config)
                acc = bp_prefix(w2, upto)
                b = w_.bodies.replace(
                    pos=w_.bodies.pos + acc * jnp.float32(1e-38)
                )
                return w_.replace(bodies=b, time=w_.time + 1.0 / 60.0), None
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
