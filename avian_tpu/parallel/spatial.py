"""Spatial domain sharding of ONE giant scene across a device mesh.

The reference scales a single scene with shared-memory multithreading
(``src/utils.rs:26-87``); scene-batch data parallelism
(``parallel/sharding.py``) is the zero-collective TPU translation for
*many* scenes. This module is the CP/SP analogue SURVEY.md §5 names for
*one* scene too big (or too latency-sensitive) for one chip: slab domain
decomposition along a world axis with **ghost-zone halo exchange over
ICI** (``jax.lax.ppermute``).

Design (classic ghost/halo domain decomposition, adapted to the
fixed-capacity SoA world):

- The host partitioner (:func:`partition_spatial`) sorts dynamic bodies
  into ``D`` slabs along one axis (joint-connected clusters are kept on
  one device), replicates static/kinematic bodies to every device (they
  move identically everywhere or not at all), and builds a ``[D, ...]``
  stacked world of identical local capacity:

  ==================  =========================================
  body slots          collider slots (1 collider per dynamic body)
  ==================  =========================================
  ``[0, S)``          shared (replicated static/kinematic)
  ``[S, S+OC)``       owned dynamic bodies of this slab
  ``[S+OC, S+OC+G)``  ghosts from the lower neighbor
  ``[.., .. + G)``    ghosts from the upper neighbor
  ==================  =========================================

- Each step (:func:`make_spatial_step`), every device packs its owned
  bodies within ``halo`` of a slab boundary into a fixed-size buffer,
  ``ppermute``\\ s it to the neighbor, writes the received rows into its
  ghost slots, and runs the ordinary single-chip ``physics_step`` on the
  local world. Owned bodies therefore see every neighbor within the halo
  with full dynamics; ghost results are discarded (overwritten by the
  next exchange), and each body's authoritative state always lives on
  its owner.

Accuracy: interactions are exact as long as a body's per-step contact
neighborhood is inside the halo; the truncation error decays with halo
width (pick ``halo`` >= 2x the largest dynamic collider diameter + the
fastest body's ``|v|*dt``). A body remains owned by its build-time slab
even if it drifts — it keeps being ghosted to whatever neighbor it is
near (one slab of drift max; call :func:`repartition` periodically for
advecting scenes). Restrictions enforced by the partitioner: every
dynamic body carries exactly one collider, and joints never connect two
dynamic bodies across slabs (clusters are co-located).
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avian_tpu.core.config import PhysicsConfig
from avian_tpu.core.state import Bodies, Colliders, Contacts, Joints, World
from avian_tpu.core.types import BodyType
from avian_tpu.pipeline.step import physics_step

SPATIAL_AXIS = "slabs"

_FAR = 1.0e30  # stand-in for +-inf outer slab boundaries


def make_slab_mesh(devices=None) -> Mesh:
    """1D mesh over all (or given) devices along the slab axis."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (SPATIAL_AXIS,))


@dataclass(frozen=True, eq=False)
class SpatialMeta:
    """Static partition metadata (host-side; captured by closures)."""

    axis: int            # world axis of the slabs (0/1/2)
    halo: float
    boundaries: tuple    # D+1 slab plane coordinates (ends at +-_FAR)
    n_shared: int        # replicated body slots [0, S)
    owned_cap: int       # owned body slots per device
    ghost_cap: int       # ghost slots per direction
    n_shared_col: int    # replicated collider slots
    n_devices: int
    # host arrays mapping every active global body -> (device, local slot)
    owner_dev: np.ndarray
    owner_slot: np.ndarray
    n_global_bodies: int


def _np_world(world: World) -> World:
    return jax.tree.map(np.asarray, world)


def partition_spatial(
    world: World,
    n_devices: int,
    axis: int = 0,
    halo: float = 2.0,
    ghost_cap: int | None = None,
    owned_headroom: int = 0,
    contact_cap: int | None = None,
):
    """Split a single-scene world into ``n_devices`` slabs along ``axis``.

    Returns ``(stacked_world [D, ...], SpatialMeta)``. Host-side numpy
    (do this before placing anything on a TPU device).
    """
    w = _np_world(world)
    b, c, j = w.bodies, w.colliders, w.joints
    nb = b.active.shape[0]

    act = np.asarray(b.active, bool)
    dyn = act & (np.asarray(b.body_type) == int(BodyType.DYNAMIC))
    shared = act & ~dyn

    # --- validate 1 collider per dynamic body -------------------------
    cact = np.asarray(c.active, bool)
    cbody = np.asarray(c.body_idx)
    dyn_col_count = np.bincount(cbody[cact], minlength=nb) * dyn[
        np.arange(nb)
    ].astype(int) if cact.any() else np.zeros(nb, int)
    dyn_col_count = np.where(dyn, dyn_col_count, 0)
    if (dyn_col_count[dyn] != 1).any():
        bad = np.nonzero(dyn & (dyn_col_count != 1))[0][:5]
        raise ValueError(
            "spatial sharding requires exactly one collider per dynamic "
            f"body (bodies {bad.tolist()} have {dyn_col_count[bad].tolist()})"
        )
    # collider index of each dynamic body
    col_of_body = np.full(nb, -1, np.int64)
    for ci in np.nonzero(cact)[0]:
        bi = cbody[ci]
        if dyn[bi]:
            col_of_body[bi] = ci

    # --- joint clusters (union-find over dynamic-dynamic joints) ------
    parent = np.arange(nb)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    jact = np.asarray(j.active, bool)
    ja = np.asarray(j.body_a)
    jb = np.asarray(j.body_b)
    for k in np.nonzero(jact)[0]:
        a_, b_ = int(ja[k]), int(jb[k])
        if dyn[a_] and dyn[b_]:
            ra, rb = find(a_), find(b_)
            if ra != rb:
                parent[ra] = rb

    dyn_idx = np.nonzero(dyn)[0]
    roots = np.asarray([find(i) for i in dyn_idx])
    coord = np.asarray(b.pos)[:, axis]
    # cluster centroid coordinate drives assignment & ordering
    cent = {}
    for i, r in zip(dyn_idx, roots):
        cent.setdefault(r, []).append(coord[i])
    cent = {r: float(np.mean(v)) for r, v in cent.items()}
    # roots in the key: two clusters with EQUAL centroids must still sort
    # contiguously, or the greedy chunker below splits one across a slab
    # boundary and build_joints' co-location assert trips.
    order = np.lexsort((dyn_idx, roots, [cent[r] for r in roots]))
    sorted_bodies = dyn_idx[order]
    sorted_roots = roots[order]

    # --- greedy chunking into D slabs at cluster boundaries -----------
    nd = len(sorted_bodies)
    target = int(np.ceil(nd / max(n_devices, 1)))
    assign = np.full(nb, -1, np.int64)
    dev, count = 0, 0
    i = 0
    while i < nd:
        # take the whole cluster of sorted_roots[i]
        r = sorted_roots[i]
        k = i
        while k < nd and sorted_roots[k] == r:
            k += 1
        assign[sorted_bodies[i:k]] = dev
        count += k - i
        i = k
        if count >= target and dev < n_devices - 1:
            dev, count = dev + 1, 0

    counts = np.bincount(assign[dyn], minlength=n_devices)
    owned_cap = int(counts.max()) + int(owned_headroom) if nd else 1
    G = int(ghost_cap) if ghost_cap is not None else owned_cap
    G = max(G, 1)

    # --- slab boundary planes ------------------------------------------
    bounds = [-_FAR]
    per_dev_sorted = [
        np.sort(coord[dyn & (assign == d)]) for d in range(n_devices)
    ]
    for d in range(1, n_devices):
        left = per_dev_sorted[d - 1]
        right = per_dev_sorted[d]
        if left.size and right.size:
            bounds.append(0.5 * (float(left[-1]) + float(right[0])))
        else:
            bounds.append(bounds[-1])
        if bounds[-1] < bounds[-2]:
            bounds[-1] = bounds[-2]
    bounds.append(_FAR)

    # --- local layout ---------------------------------------------------
    shared_idx = np.nonzero(shared)[0]
    S = len(shared_idx)
    shared_cols = np.nonzero(cact & ~dyn[cbody])[0]
    SC = len(shared_cols)
    L = S + owned_cap + 2 * G
    LC = SC + owned_cap + 2 * G

    # global body -> local slot on its owner (shared bodies on every dev)
    g2l = np.full(nb, 0, np.int64)  # padded refs stay 0
    for s, gi in enumerate(shared_idx):
        g2l[gi] = s
    owner_dev = np.zeros(nb, np.int64)
    owner_slot = np.zeros(nb, np.int64)
    owner_dev[shared_idx] = 0
    owner_slot[shared_idx] = np.arange(S)
    owned_lists = []
    for d in range(n_devices):
        mine = sorted_bodies[assign[sorted_bodies] == d]
        owned_lists.append(mine)
        g2l[mine] = S + np.arange(len(mine))
        owner_dev[mine] = d
        owner_slot[mine] = S + np.arange(len(mine))

    # --- build stacked per-device worlds --------------------------------
    tmpl_b = _np_world_leaf(Bodies.zeros(L))
    tmpl_c = _np_world_leaf(Colliders.zeros(LC))

    def build_bodies():
        idx = np.zeros((n_devices, L), np.int64)
        valid = np.zeros((n_devices, L), bool)
        for d in range(n_devices):
            idx[d, :S] = shared_idx
            valid[d, :S] = True
            mine = owned_lists[d]
            idx[d, S:S + len(mine)] = mine
            valid[d, S:S + len(mine)] = True

        def one(field, tfield):
            rows = np.asarray(field)[idx]  # [D, L, ...]
            t = np.broadcast_to(
                tfield, (n_devices,) + tfield.shape
            )
            v = valid.reshape(valid.shape + (1,) * (rows.ndim - 2))
            return np.where(v, rows, t).astype(rows.dtype)

        out = jax.tree.map(one, b, tmpl_b)
        # active only where valid (padding rows copy slot data of body 0)
        act_rows = np.asarray(b.active)[idx] & valid
        return out.replace(active=act_rows)

    def build_colliders():
        idx = np.zeros((n_devices, LC), np.int64)
        valid = np.zeros((n_devices, LC), bool)
        bidx_l = np.zeros((n_devices, LC), np.int64)
        for d in range(n_devices):
            idx[d, :SC] = shared_cols
            valid[d, :SC] = True
            bidx_l[d, :SC] = g2l[cbody[shared_cols]] if SC else 0
            mine = owned_lists[d]
            cols = col_of_body[mine]
            idx[d, SC:SC + len(mine)] = cols
            valid[d, SC:SC + len(mine)] = True
            bidx_l[d, SC:SC + len(mine)] = S + np.arange(len(mine))
        # ghost collider slots always point at their aligned ghost body
        bidx_l[:, SC + 0:SC + owned_cap] = np.where(
            valid[:, SC:SC + owned_cap],
            bidx_l[:, SC:SC + owned_cap],
            np.arange(S, S + owned_cap)[None, :],
        )
        bidx_l[:, LC - 2 * G:] = (S + owned_cap) + np.arange(2 * G)[None, :]

        def one(field, tfield):
            rows = np.asarray(field)[idx]
            t = np.broadcast_to(tfield, (n_devices,) + tfield.shape)
            v = valid.reshape(valid.shape + (1,) * (rows.ndim - 2))
            return np.where(v, rows, t).astype(rows.dtype)

        out = jax.tree.map(one, c, tmpl_c)
        act_rows = np.asarray(c.active)[idx] & valid
        return out.replace(
            active=act_rows, body_idx=bidx_l.astype(np.int32)
        )

    def build_joints():
        if j.active.shape[0] == 0 or not jact.any():
            return jax.tree.map(
                lambda x: np.broadcast_to(
                    np.asarray(x), (n_devices,) + x.shape
                ).copy(),
                Joints.zeros(1),
            )
        per_dev = [[] for _ in range(n_devices)]
        for k in np.nonzero(jact)[0]:
            a_, b_ = int(ja[k]), int(jb[k])
            if dyn[a_]:
                d = int(assign[a_])
            elif dyn[b_]:
                d = int(assign[b_])
            else:
                d = 0
            if dyn[a_] and dyn[b_] and assign[a_] != assign[b_]:
                raise AssertionError(
                    "joint clusters must be co-located (partitioner bug)"
                )
            per_dev[d].append(k)
        JL = max(max((len(p) for p in per_dev), default=0), 1)
        tmpl_j = _np_world_leaf(Joints.zeros(JL))
        idx = np.zeros((n_devices, JL), np.int64)
        valid = np.zeros((n_devices, JL), bool)
        for d in range(n_devices):
            ks = per_dev[d]
            idx[d, :len(ks)] = ks
            valid[d, :len(ks)] = True

        def one(field, tfield):
            rows = np.asarray(field)[idx]
            t = np.broadcast_to(tfield, (n_devices,) + tfield.shape)
            v = valid.reshape(valid.shape + (1,) * (rows.ndim - 2))
            return np.where(v, rows, t).astype(rows.dtype)

        out = jax.tree.map(one, j, tmpl_j)
        return out.replace(
            active=np.asarray(j.active)[idx] & valid,
            body_a=g2l[np.asarray(j.body_a)[idx]].astype(np.int32),
            body_b=g2l[np.asarray(j.body_b)[idx]].astype(np.int32),
        )

    bodies = build_bodies()
    colliders = build_colliders()
    joints = build_joints()
    cc = contact_cap if contact_cap is not None else max(8 * LC, 64)
    contacts = jax.tree.map(
        lambda x: np.broadcast_to(
            np.asarray(x), (n_devices,) + x.shape
        ).copy(),
        Contacts.zeros(cc),
    )
    stacked = World(
        bodies=jax.tree.map(jnp.asarray, bodies),
        colliders=jax.tree.map(jnp.asarray, colliders),
        contacts=jax.tree.map(jnp.asarray, contacts),
        joints=jax.tree.map(jnp.asarray, joints),
        gravity=jnp.broadcast_to(jnp.asarray(w.gravity), (n_devices, 3)),
        time=jnp.broadcast_to(jnp.asarray(w.time), (n_devices,)),
        diverged=jnp.broadcast_to(jnp.asarray(w.diverged), (n_devices,)),
        convex_verts=jnp.broadcast_to(
            jnp.asarray(w.convex_verts),
            (n_devices,) + w.convex_verts.shape,
        ),
        shape_pairs=world.shape_pairs,
        custom_shapes=world.custom_shapes,
    )
    meta = SpatialMeta(
        axis=axis, halo=float(halo), boundaries=tuple(bounds),
        n_shared=S, owned_cap=owned_cap, ghost_cap=G, n_shared_col=SC,
        n_devices=n_devices, owner_dev=owner_dev, owner_slot=owner_slot,
        n_global_bodies=nb,
    )
    return stacked, meta


def _np_world_leaf(x):
    return jax.tree.map(np.asarray, x)


def make_spatial_step(config: PhysicsConfig, mesh: Mesh, meta: SpatialMeta,
                      return_diagnostics: bool = False, **step_kw):
    """Build the jitted multi-chip step: halo exchange + local physics.

    ``step([D, ...] world) -> [D, ...] world`` (plus a diagnostics dict
    with halo overflow counters when ``return_diagnostics``). The slab
    axis of the stacked world must be sharded over ``mesh``.
    """
    D = meta.n_devices
    S, OC, G = meta.n_shared, meta.owned_cap, meta.ghost_cap
    SC = meta.n_shared_col
    bnd = jnp.asarray(meta.boundaries, jnp.float32)
    ghost_lo = S + OC

    def exchange(w):
        L = w.bodies.active.shape[0]
        d = lax.axis_index(SPATIAL_AXIS)
        lower, upper = bnd[d], bnd[d + 1]
        pos_a = w.bodies.pos[:, meta.axis]
        slot = jnp.arange(L)
        owned = (slot >= S) & (slot < S + OC) & w.bodies.active
        send_up = owned & (pos_a >= upper - meta.halo)
        send_dn = owned & (pos_a <= lower + meta.halo)

        def pack(mask):
            keys = jnp.where(mask, slot, L)
            sk = jnp.sort(keys)[:G]
            valid = sk < L
            idx = jnp.minimum(sk, L - 1)
            dropped = mask.sum() - valid.sum()
            rows_b = jax.tree.map(lambda x: x[idx], w.bodies)
            cidx = jnp.clip(idx - S + SC, 0, w.colliders.active.shape[0] - 1)
            rows_c = jax.tree.map(lambda x: x[cidx], w.colliders)
            return (rows_b, rows_c, valid), dropped

        pkt_up, drop_up = pack(send_up)
        pkt_dn, drop_dn = pack(send_dn)
        fwd = [(i, i + 1) for i in range(D - 1)]
        bwd = [(i + 1, i) for i in range(D - 1)]
        # ghosts arriving from the lower neighbor ride the forward perm
        from_dn = jax.tree.map(
            lambda x: lax.ppermute(x, SPATIAL_AXIS, fwd), pkt_up
        )
        from_up = jax.tree.map(
            lambda x: lax.ppermute(x, SPATIAL_AXIS, bwd), pkt_dn
        )

        def write(w, pkt, start):
            rows_b, rows_c, valid = pkt
            rows_b = rows_b.replace(
                active=valid,
                sleeping=rows_b.sleeping & valid,
            )
            bodies = jax.tree.map(
                lambda full, rows: lax.dynamic_update_slice_in_dim(
                    full, rows, start, axis=0
                ),
                w.bodies, rows_b,
            )
            cstart = start - S + SC
            rows_c = rows_c.replace(
                active=valid & rows_c.active,
                body_idx=(start + jnp.arange(G)).astype(jnp.int32),
            )
            colliders = jax.tree.map(
                lambda full, rows: lax.dynamic_update_slice_in_dim(
                    full, rows, cstart, axis=0
                ),
                w.colliders, rows_c,
            )
            return w.replace(bodies=bodies, colliders=colliders)

        w = write(w, from_dn, ghost_lo)
        w = write(w, from_up, ghost_lo + G)
        return w, drop_up + drop_dn

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(SPATIAL_AXIS),),
        out_specs=P(SPATIAL_AXIS),
        check_vma=False,
    )
    def step(blk):
        w = jax.tree.map(lambda x: x[0], blk)
        w, halo_dropped = exchange(w)
        w = physics_step(w, config, **step_kw)
        out = jax.tree.map(lambda x: x[None], w)
        if return_diagnostics:
            return out, {"halo_dropped": halo_dropped[None]}
        return out

    return step


def shard_spatial(stacked: World, mesh: Mesh) -> World:
    """Place the stacked world so the slab axis is split over the mesh."""
    sharding = NamedSharding(mesh, P(SPATIAL_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)


def gather_owned(stacked: World, meta: SpatialMeta):
    """Host-side: authoritative global (pos, quat, lin_vel, ang_vel)
    arrays indexed by the ORIGINAL world's body slots."""
    b = jax.tree.map(np.asarray, stacked.bodies)
    d, s = meta.owner_dev, meta.owner_slot
    return (
        b.pos[d, s], b.quat[d, s], b.lin_vel[d, s], b.ang_vel[d, s],
    )


def repartition(stacked: World, meta: SpatialMeta, original: World,
                **kw):
    """Host-side rebalance for advecting scenes: write the authoritative
    body states back into (a copy of) the original world layout and
    partition again. Returns ``(stacked', meta')``."""
    pos, quat, lin, ang = gather_owned(stacked, meta)
    w = _np_world(original)
    bodies = w.bodies.replace(pos=pos, quat=quat, lin_vel=lin, ang_vel=ang)
    w = w.replace(bodies=bodies)
    return partition_spatial(
        w, meta.n_devices, axis=meta.axis, halo=meta.halo, **kw
    )
