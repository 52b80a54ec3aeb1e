"""Grid-accelerated spatial queries + persistent caster components.

TPU-native counterpart of the reference's per-step BVH rebuild
(``src/spatial_query/pipeline.rs:26-36,97-120``) and the persistent
``RayCaster`` component (``src/spatial_query/ray_caster.rs:78-140``).

A BVH traversal is pointer-chasing and branch-heavy — hostile to the VPU.
Instead we rebuild (each call) the same uniform-grid cell list the
broadphase uses: cell size = the largest finite AABB extent, every AABB
covers <= 8 cells, entries sorted by packed cell key. A raycast walks its
cells with a branch-free 3D-DDA (fixed step count) and tests only the
entries of visited cells — ~cells x window shape tests per ray instead of
M. Unbounded colliders (half-spaces) are tested densely like in the
broadphase.

Completeness: a shape's AABB is covered by its grid cells, so any ray
reaching the shape passes through a covered cell within the traversal
range (``_MAX_CELLS`` cells, i.e. ``_MAX_CELLS * cell_size`` distance —
beyond that a miss is possible and the caller should raise
``max_cells``).
"""

from dataclasses import dataclass, fields

import numpy as _np

import jax
import jax.numpy as jnp

from avian_tpu.geometry import shapes
from avian_tpu.math import quat as quat_m
from avian_tpu.math import vec
from avian_tpu.queries.filter import QueryFilter, collider_query_mask
from avian_tpu.queries.raycast import RayHit, _ray_one_collider
from avian_tpu.pipeline.broadphase import MAX_GLOBALS, update_collider_poses

_BIG = 1e30
_SENTINEL = _np.iinfo(_np.int32).max

_CELL_OFFSETS = _np.asarray(
    [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
    _np.int32,
)


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


def _pack(cc):
    return (
        ((cc[..., 0] & 1023) << 20)
        | ((cc[..., 1] & 1023) << 10)
        | (cc[..., 2] & 1023)
    )


@_register
@dataclass(frozen=True)
class QueryGrid:
    """Sorted cell-list over the collider AABBs (rebuild per step, like the
    reference's full BVH rebuild)."""

    cell: jnp.ndarray       # f32[] cell size
    skey: jnp.ndarray       # i32[8M] sorted packed cell keys
    scol: jnp.ndarray       # i32[8M] collider id per sorted entry
    global_idx: jnp.ndarray  # i32[G] dense-pass colliders (planes/huge)
    global_valid: jnp.ndarray  # bool[G]


def build_query_grid(world) -> QueryGrid:
    """Build the grid from current AABBs (``update_aabbs`` must have run)."""
    col = world.colliders
    m = col.capacity

    ext_c = jnp.max(col.aabb_max - col.aabb_min, axis=-1)
    is_plane = ext_c > shapes.BIG
    finite = col.active & ~is_plane
    # Median-relative "big" routing — see pipeline/broadphase.py.
    n_finite = jnp.sum(finite.astype(jnp.int32))
    ext_sorted = jnp.sort(jnp.where(finite, ext_c, jnp.inf))
    median_ext = ext_sorted[
        jnp.clip(n_finite // 2, 0, ext_c.shape[0] - 1)
    ]
    is_big = finite & (ext_c > 4.0 * jnp.maximum(median_ext, 1e-6))
    is_global = is_plane | is_big
    in_grid = col.active & ~is_global

    ext_axis = col.aabb_max - col.aabb_min
    cell = 1.001 * jnp.maximum(
        jnp.max(jnp.where(in_grid[:, None], ext_axis, 0.0)), 1e-3
    )
    i0 = jnp.floor(col.aabb_min / cell).astype(jnp.int32)
    i1 = jnp.floor(col.aabb_max / cell).astype(jnp.int32)
    cc = i0[:, None, :] + jnp.asarray(_CELL_OFFSETS)[None, :, :]
    entry_ok = jnp.all(cc <= i1[:, None, :], axis=-1) & in_grid[:, None]
    ckey = jnp.where(entry_ok, _pack(cc), _SENTINEL)

    order = jnp.argsort(ckey.reshape(-1), stable=True)
    skey = ckey.reshape(-1)[order]
    scol = (order // 8).astype(jnp.int32)

    g_cap = min(MAX_GLOBALS, m)
    g_score = jnp.where(is_global & col.active, 1, 0)
    g_idx = jnp.argsort(-g_score)[:g_cap]
    return QueryGrid(
        cell=cell,
        skey=skey,
        scol=scol,
        global_idx=g_idx.astype(jnp.int32),
        global_valid=g_score[g_idx] > 0,
    )


def cast_ray_grid(
    world,
    grid: QueryGrid,
    origin,
    direction,
    max_distance,
    solid=True,
    qfilter: QueryFilter = None,
    max_cells: int = 64,
    cell_window: int = 32,
) -> RayHit:
    """Grid-accelerated first-hit raycast. Matches ``cast_ray`` brute-force
    results for hits within ``max_cells * cell`` travel distance.

    Vectorize over many rays with ``jax.vmap`` over (origin, direction).
    """
    qfilter = qfilter if qfilter is not None else QueryFilter()
    col = world.colliders
    pos, quat = update_collider_poses(world)
    ok = collider_query_mask(col, qfilter)

    o = jnp.asarray(origin, jnp.float32)
    d = vec.normalize_or(
        jnp.asarray(direction, jnp.float32), jnp.asarray([1.0, 0.0, 0.0])
    )

    def test_collider(ci, valid):
        """Ray vs collider ci; returns (t, world normal)."""
        t, n_w = _ray_one_collider(
            o, d, pos[ci], quat[ci], col.shape_type[ci], col.params[ci],
            solid, pool=world.convex_verts,
            custom_shapes=world.custom_shapes,
        )
        t = jnp.where(valid & ok[ci] & (t <= max_distance) & (t >= 0.0), t, _BIG)
        return t, n_w

    # ---- DDA over grid cells -------------------------------------------
    cell = grid.cell
    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, jnp.where(d >= 0, 1e-12, -1e-12))
    step = jnp.where(d >= 0.0, 1, -1).astype(jnp.int32)
    c0 = jnp.floor(o / cell).astype(jnp.int32)
    # Distance to the first boundary along each axis.
    next_b = (c0.astype(jnp.float32) + (step > 0)) * cell
    t_max0 = (next_b - o) * inv_d
    t_delta = jnp.abs(cell * inv_d)

    w = cell_window
    ne = grid.skey.shape[0]

    def visit(carry, _):
        cc, t_max, t_best, n_best, ci_best, t_entry = carry
        key = _pack(cc)
        start = jnp.searchsorted(grid.skey, key)
        idx = jnp.clip(start + jnp.arange(w), 0, ne - 1)
        same = grid.skey[idx] == key
        cis = grid.scol[idx]

        ts, ns = jax.vmap(test_collider)(cis, same)
        j = jnp.argmin(ts)
        better = ts[j] < t_best
        t_best = jnp.where(better, ts[j], t_best)
        n_best = jnp.where(better, ns[j], n_best)
        ci_best = jnp.where(better, cis[j], ci_best)

        # Advance to the next cell (Amanatides-Woo).
        ax = jnp.argmin(t_max)
        t_entry = t_max[ax]
        cc = cc.at[ax].add(step[ax])
        t_max = t_max.at[ax].add(t_delta[ax])
        return (cc, t_max, t_best, n_best, ci_best, t_entry), None

    init = (
        c0, t_max0, jnp.asarray(_BIG), jnp.zeros(3, jnp.float32),
        jnp.asarray(-1, jnp.int32), jnp.asarray(0.0),
    )
    (cc, t_max, t_best, n_best, ci_best, _), _ = jax.lax.scan(
        visit, init, None, length=max_cells
    )

    # ---- dense pass over global colliders ------------------------------
    ts, ns = jax.vmap(test_collider)(grid.global_idx, grid.global_valid)
    j = jnp.argmin(ts)
    better = ts[j] < t_best
    t_best = jnp.where(better, ts[j], t_best)
    n_best = jnp.where(better, ns[j], n_best)
    ci_best = jnp.where(better, grid.global_idx[j], ci_best)

    found = t_best < _BIG
    ci = jnp.where(found, ci_best, -1)
    return RayHit(
        collider=ci.astype(jnp.int32),
        body=jnp.where(found, col.body_idx[ci_best], -1).astype(jnp.int32),
        distance=jnp.where(found, t_best, jnp.inf),
        point=o + d * jnp.where(found, t_best, 0.0),
        normal=n_best,
        hit=found,
    )


# ---------------------------------------------------------------------------
# Persistent casters (the RayCaster / ShapeCaster component analogue):
# caster state lives in arrays; update_ray_casters evaluates all of them
# against the current world in one vectorized call per step.
# ---------------------------------------------------------------------------


@_register
@dataclass(frozen=True)
class RayCasters:
    """SoA of persistent ray casters (``ray_caster.rs:78-140``). A caster
    may be attached to a body (``body >= 0``): origin/direction are then in
    the body's local frame and follow it."""

    body: jnp.ndarray       # i32[K] attached body (-1 = world space)
    origin: jnp.ndarray     # f32[K, 3]
    direction: jnp.ndarray  # f32[K, 3]
    max_distance: jnp.ndarray  # f32[K]
    solid: jnp.ndarray      # bool[K]
    enabled: jnp.ndarray    # bool[K]

    @staticmethod
    def create(casters):
        """Build from a list of dicts with keys body/origin/direction/
        max_distance/solid."""
        import numpy as np

        k = max(len(casters), 1)
        body = np.full(k, -1, np.int32)
        origin = np.zeros((k, 3), np.float32)
        direction = np.zeros((k, 3), np.float32)
        direction[:, 0] = 1.0
        max_distance = np.full(k, 1e9, np.float32)
        solid = np.ones(k, bool)
        enabled = np.zeros(k, bool)
        for i, c in enumerate(casters):
            body[i] = c.get("body", -1)
            origin[i] = c.get("origin", (0, 0, 0))
            direction[i] = c.get("direction", (1, 0, 0))
            max_distance[i] = c.get("max_distance", 1e9)
            solid[i] = c.get("solid", True)
            enabled[i] = True
        return RayCasters(
            body=jnp.asarray(body),
            origin=jnp.asarray(origin),
            direction=jnp.asarray(direction),
            max_distance=jnp.asarray(max_distance),
            solid=jnp.asarray(solid),
            enabled=jnp.asarray(enabled),
        )


def update_ray_casters(
    world, casters: RayCasters, grid: QueryGrid = None,
    qfilter: QueryFilter = None, **kw
) -> RayHit:
    """Evaluate every enabled caster against the world (one vectorized
    call; the reference runs its ``RayCaster`` systems per step). Returns a
    batched ``RayHit`` (leaves have a leading K axis)."""
    if grid is None:
        grid = build_query_grid(world)
    b = world.bodies

    attached = casters.body >= 0
    bidx = jnp.maximum(casters.body, 0)
    bq = b.quat[bidx]
    o_world = jnp.where(
        attached[:, None],
        b.pos[bidx] + quat_m.rotate(bq, casters.origin),
        casters.origin,
    )
    d_world = jnp.where(
        attached[:, None],
        quat_m.rotate(bq, casters.direction),
        casters.direction,
    )

    hits = jax.vmap(
        lambda o, d, md: cast_ray_grid(
            world, grid, o, d, md, qfilter=qfilter, **kw
        )
    )(o_world, d_world, casters.max_distance)
    # Disabled casters report misses.
    en = casters.enabled
    return RayHit(
        collider=jnp.where(en, hits.collider, -1),
        body=jnp.where(en, hits.body, -1),
        distance=jnp.where(en, hits.distance, jnp.inf),
        point=jnp.where(en[:, None], hits.point, 0.0),
        normal=jnp.where(en[:, None], hits.normal, 0.0),
        hit=en & hits.hit,
    )


@_register
@dataclass(frozen=True)
class ShapeCasters:
    """SoA of persistent shape casters (``shape_caster.rs``), mirroring
    :class:`RayCasters`: origin/direction live in the attached body's
    frame (or world frame with ``body == -1``)."""

    body: jnp.ndarray        # i32[K]
    shape_type: jnp.ndarray  # i32[K] (static per slot in practice)
    params: jnp.ndarray      # f32[K, 8]
    origin: jnp.ndarray      # f32[K, 3]
    rotation: jnp.ndarray    # f32[K, 4]
    direction: jnp.ndarray   # f32[K, 3]
    max_distance: jnp.ndarray  # f32[K]
    enabled: jnp.ndarray     # bool[K]

    @staticmethod
    def create(casters):
        import numpy as np

        k = max(len(casters), 1)
        body = np.full(k, -1, np.int32)
        st = np.zeros(k, np.int32)
        prm = np.zeros((k, 8), np.float32)
        origin = np.zeros((k, 3), np.float32)
        rot = np.zeros((k, 4), np.float32)
        rot[:, 3] = 1.0
        direction = np.zeros((k, 3), np.float32)
        direction[:, 0] = 1.0
        max_distance = np.full(k, 1e9, np.float32)
        enabled = np.zeros(k, bool)
        for i, c in enumerate(casters):
            body[i] = c.get("body", -1)
            st[i] = int(c["shape_type"])
            p = np.asarray(c["params"], np.float32).reshape(-1)
            prm[i, : p.shape[0]] = p
            origin[i] = c.get("origin", (0, 0, 0))
            rot[i] = c.get("rotation", (0, 0, 0, 1))
            direction[i] = c.get("direction", (1, 0, 0))
            max_distance[i] = c.get("max_distance", 1e9)
            enabled[i] = True
        return ShapeCasters(
            body=jnp.asarray(body),
            shape_type=jnp.asarray(st),
            params=jnp.asarray(prm),
            origin=jnp.asarray(origin),
            rotation=jnp.asarray(rot),
            direction=jnp.asarray(direction),
            max_distance=jnp.asarray(max_distance),
            enabled=jnp.asarray(enabled),
        )


def update_shape_casters(world, casters: ShapeCasters, qfilter=None):
    """Evaluate every enabled shape caster (one call per caster slot —
    shape type must be uniform per compiled program, so the slots are
    looped statically like the reference's per-entity ShapeCaster
    systems)."""
    from avian_tpu.queries.shapecast import cast_shape

    b = world.bodies
    hits = []
    k = casters.body.shape[0]
    st_host = [int(x) for x in jax.device_get(casters.shape_type)]
    for i in range(k):
        attached = casters.body[i] >= 0
        bidx = jnp.maximum(casters.body[i], 0)
        bq = b.quat[bidx]
        o = jnp.where(
            attached,
            b.pos[bidx] + quat_m.rotate(bq, casters.origin[i]),
            casters.origin[i],
        )
        d = jnp.where(
            attached, quat_m.rotate(bq, casters.direction[i]),
            casters.direction[i],
        )
        rot = jnp.where(
            attached, quat_m.mul(bq, casters.rotation[i]),
            casters.rotation[i],
        )
        hit = cast_shape(
            world, st_host[i], casters.params[i], o, rot, d,
            casters.max_distance[i], qfilter=qfilter,
        )
        hits.append(hit)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *hits)
