"""Spatial domain sharding of one giant scene (`parallel/spatial.py`) —
the CP/SP analogue SURVEY.md §5 names: slab decomposition + ghost-zone
halo exchange over the device mesh with `lax.ppermute`.

Runs on the virtual 8-device CPU mesh from tests/conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avian_tpu import BodyType, JointType, PhysicsConfig, SceneBuilder, physics_step
from avian_tpu.parallel import spatial

from conftest import TEST_SHAPE_PAIRS

CFG = PhysicsConfig(max_colors=4)


def row_scene(n=16, spacing=1.5):
    """Ground plane + a row of falling boxes along x."""
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    ids = []
    for i in range(n):
        bd = b.add_body(pos=(i * spacing, 1.0 + 0.1 * (i % 3), 0.0))
        b.box(bd, 0.5, 0.5, 0.5)
        ids.append(bd)
    w = b.finalize(max_bodies=n + 8, max_colliders=n + 8,
                   max_contacts=16 * n)
    return w.replace(shape_pairs=TEST_SHAPE_PAIRS), ids


def run_sharded(w, n_dev, steps, halo=2.0, ghost_cap=None,
                return_diag=False):
    stacked, meta = spatial.partition_spatial(
        w, n_dev, axis=0, halo=halo, ghost_cap=ghost_cap
    )
    mesh = spatial.make_slab_mesh(jax.devices()[:n_dev])
    stacked = spatial.shard_spatial(stacked, mesh)
    step = spatial.make_spatial_step(CFG, mesh, meta,
                                     return_diagnostics=return_diag)
    diags = []
    for _ in range(steps):
        out = step(stacked)
        if return_diag:
            stacked, d = out
            diags.append(d)
        else:
            stacked = out
    pos, quat, lin, ang = spatial.gather_owned(stacked, meta)
    return stacked, meta, (pos, quat, lin, ang), diags


def test_partition_metadata():
    w, ids = row_scene()
    stacked, meta = spatial.partition_spatial(w, 4, axis=0, halo=2.0)
    assert meta.n_devices == 4 and meta.n_shared == 1
    # boundaries monotone, 16 bodies over 4 slabs
    bs = meta.boundaries
    assert all(bs[i] <= bs[i + 1] for i in range(len(bs) - 1))
    act = np.asarray(stacked.bodies.active)
    assert act.sum() == 4 * meta.n_shared + len(ids)  # no ghosts yet
    # every dynamic body owned exactly once, in its slab
    pos0 = np.asarray(w.bodies.pos)
    for i in ids:
        d, s = int(meta.owner_dev[i]), int(meta.owner_slot[i])
        got = np.asarray(stacked.bodies.pos)[d, s]
        np.testing.assert_allclose(got, pos0[i])
        assert bs[d] <= pos0[i, 0] <= bs[d + 1]


def test_sharded_matches_unsharded():
    w, ids = row_scene()
    steps = 40
    _, _, (pos, quat, lin, _), _ = run_sharded(w, 4, steps)

    w2 = w
    unsharded = jax.jit(
        lambda w_: jax.lax.scan(
            lambda s, _: (physics_step(s, CFG), 0), w_, None, length=steps
        )[0]
    )(w2)
    ref = np.asarray(unsharded.bodies.pos)
    got = pos
    err = np.abs(ref[ids] - got[ids]).max()
    # boxes interact only with the ground + nearest neighbors; the halo
    # covers the whole interaction neighborhood so the sharded run tracks
    # the unsharded one tightly
    assert err < 5e-3, err
    assert np.isfinite(got[ids]).all()


def test_cross_boundary_collision():
    """Two balls owned by different slabs fly at each other, collide in
    the halo region, and bounce apart — momentum crosses the boundary."""
    b = SceneBuilder()
    l = b.add_body(pos=(-2.0, 0.0, 0.0), lin_vel=(4.0, 0.0, 0.0))
    b.sphere(l, 0.5, restitution=1.0)
    r = b.add_body(pos=(2.0, 0.0, 0.0), lin_vel=(-4.0, 0.0, 0.0))
    b.sphere(r, 0.5, restitution=1.0)
    w = b.finalize(max_bodies=4, max_colliders=4, max_contacts=16)
    w = w.replace(
        gravity=jnp.zeros(3, jnp.float32), shape_pairs=TEST_SHAPE_PAIRS
    )
    _, meta, (pos, _, lin, _), _ = run_sharded(w, 2, 45, halo=2.5)
    assert int(meta.owner_dev[l]) != int(meta.owner_dev[r])
    # after the bounce both retreated toward their own slabs
    assert lin[l][0] < -1.0, lin[l]
    assert lin[r][0] > 1.0, lin[r]
    assert pos[l][0] < pos[r][0]


def test_joint_cluster_colocated():
    """A distance joint spanning the middle of the row forces both
    endpoints onto one device, and the joint holds under gravity."""
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    ids = []
    for i in range(8):
        bd = b.add_body(pos=(i * 2.0, 1.0, 0.0))
        b.box(bd, 0.5, 0.5, 0.5)
        ids.append(bd)
    # join the two middle boxes (indices 3, 4 -> would straddle a cut)
    b.add_joint(
        JointType.DISTANCE, ids[3], ids[4],
        limit_min=0.0, limit_max=2.2, limit_enabled=True,
    )
    w = b.finalize(max_bodies=16, max_colliders=16, max_contacts=128)
    w = w.replace(shape_pairs=TEST_SHAPE_PAIRS)
    stacked, meta = spatial.partition_spatial(w, 4, axis=0, halo=2.5)
    assert int(meta.owner_dev[ids[3]]) == int(meta.owner_dev[ids[4]])
    mesh = spatial.make_slab_mesh(jax.devices()[:4])
    stacked = spatial.shard_spatial(stacked, mesh)
    step = spatial.make_spatial_step(CFG, mesh, meta)
    for _ in range(30):
        stacked = step(stacked)
    pos, _, _, _ = spatial.gather_owned(stacked, meta)
    gap = np.linalg.norm(pos[ids[4]] - pos[ids[3]])
    assert gap < 2.4, gap
    assert np.isfinite(pos[ids]).all()


def test_determinism():
    w, ids = row_scene(n=12)
    _, _, (p1, q1, _, _), _ = run_sharded(w, 4, 25)
    _, _, (p2, q2, _, _), _ = run_sharded(w, 4, 25)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(q1, q2)


def test_halo_overflow_is_loud():
    """With ghost_cap=1 and many bodies in the halo band, the exchange
    reports dropped ghosts instead of silently losing them."""
    w, ids = row_scene(n=16, spacing=0.9)  # dense row: wide halo bands
    _, _, _, diags = run_sharded(
        w, 4, 3, halo=6.0, ghost_cap=1, return_diag=True
    )
    total = sum(int(np.asarray(d["halo_dropped"]).sum()) for d in diags)
    assert total > 0


def test_repartition_roundtrip():
    w, ids = row_scene(n=12)
    stacked, meta = spatial.partition_spatial(w, 4, axis=0, halo=2.0)
    stacked2, meta2 = spatial.repartition(stacked, meta, w)
    pos, _, _, _ = spatial.gather_owned(stacked2, meta2)
    np.testing.assert_allclose(
        pos[ids], np.asarray(w.bodies.pos)[ids], atol=1e-6
    )
