"""Approximate convex decomposition (`avian_tpu.native`) — counterpart of
the reference's VHACD path (`Collider::convex_decomposition`,
`/root/reference/src/collision/collider/parry/mod.rs:962-990`).

Covers: native C++ kernel vs numpy fallback parity, voxelization
solidity, part counts on canonical shapes (L splits, ball stays whole),
and builder integration (compound hulls with real mass properties).
"""

import numpy as np
import pytest

from avian_tpu import native


def box_mesh(lo, hi):
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    v = np.array(
        [
            [lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
            [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
            [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
            [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]],
        ],
        np.float32,
    )
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
            [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3],
        ],
        np.int32,
    )
    return v, f


def l_mesh():
    v1, f1 = box_mesh([0, 0, 0], [2, 0.5, 0.5])
    v2, f2 = box_mesh([0, 0, 0], [0.5, 2, 0.5])
    return np.concatenate([v1, v2]), np.concatenate([f1, f2 + 8])


def ball_mesh():
    th = np.linspace(0, np.pi, 12)
    ph = np.linspace(0, 2 * np.pi, 24, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    pts = np.stack(
        [np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1
    ).reshape(-1, 3).astype(np.float32)
    from scipy.spatial import ConvexHull

    h = ConvexHull(pts)
    return pts, h.simplices.astype(np.int32)


import os
import shutil


@pytest.mark.skipif(
    shutil.which("g++") is None
    or bool(os.environ.get("AVIAN_TPU_NO_NATIVE")),
    reason="no g++ (or native disabled): numpy fallback is the design",
)
def test_native_builds():
    """The C++ kernel must compile and load when g++ is present (it is in
    the CI image); the numpy fallback exists for environments without it."""
    assert native.native_available()


def test_voxelize_is_solid_and_matches_fallback():
    V, F = l_mesh()
    grid, origin, voxel = native.voxelize_mesh(V, F, resolution=24)
    # watertight mesh -> interior filled: far more voxels than the shell
    xs = np.nonzero(grid)
    assert grid.sum() > 500
    # every mesh vertex lies in or adjacent to a solid voxel
    q = np.floor((V - origin) / voxel).astype(int)
    q = np.clip(q, 0, np.asarray(grid.shape) - 1)
    assert grid[q[:, 0], q[:, 1], q[:, 2]].mean() > 0.9
    del xs
    gp = native._py_voxelize(V, F, grid.shape, origin, voxel)
    assert (gp == grid).all()


def test_best_plane_native_matches_fallback():
    V, F = l_mesh()
    grid, _, _ = native.voxelize_mesh(V, F, resolution=20)
    xs, ys, zs = np.nonzero(grid)
    occ = grid[xs.min():xs.max() + 1, ys.min():ys.max() + 1,
               zs.min():zs.max() + 1]
    got_n = native._best_plane_once(occ, 4, 4, 0.05)
    got_p = native._py_best_plane(occ, 4, 4, 0.05)
    assert got_n is not None and got_p is not None
    assert got_n[:2] == got_p[:2]
    assert got_n[2] == pytest.approx(got_p[2], rel=1e-6)


def test_l_splits_ball_does_not():
    V, F = l_mesh()
    parts = native.decompose_mesh(V, F, resolution=24, max_parts=8)
    assert 2 <= len(parts) <= 3, len(parts)
    # parts jointly cover the mesh's AABB corners region: total corner
    # point count is sane and every part is a 3D point cloud
    for p in parts:
        assert p.shape[1] == 3 and p.shape[0] >= 8

    V, F = ball_mesh()
    parts = native.decompose_mesh(V, F, resolution=24, max_parts=8)
    assert len(parts) == 1, len(parts)


def test_open_mesh_degrades_to_shell():
    # a single quad (open surface): flood fill leaks, solid == surface
    V = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]], np.float32
    )
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    grid, _, _ = native.voxelize_mesh(V, F, resolution=8)
    assert 0 < grid.sum() < grid.size


def test_builder_compound_of_hulls():
    from avian_tpu import BodyType, SceneBuilder
    from avian_tpu.core.types import ShapeType

    V, F = l_mesh()
    b = SceneBuilder()
    body = b.add_body(pos=(0, 2, 0))
    cols = b.convex_decomposition(body, V, F, resolution=24, max_parts=8)
    assert len(cols) >= 2
    w = b.finalize(max_bodies=4, max_colliders=16, max_contacts=64)
    st = np.asarray(w.colliders.shape_type)
    for c in cols:
        assert st[c] == ShapeType.CONVEX
    # compound mass properties: the L volume is 0.875; voxel hulls
    # inflate it some but it must be positive and bounded
    m = 1.0 / float(np.asarray(w.bodies.inv_mass)[body])
    assert 0.5 < m < 2.5, m


def test_recipe_kind():
    from avian_tpu import BodyType, SceneBuilder
    from avian_tpu.core import constructor

    V, F = l_mesh()
    b = SceneBuilder()
    body = b.add_body(pos=(0, 2, 0))
    cols = constructor.spawn(
        b, body,
        {"kind": "convex_decomposition", "vertices": V, "faces": F,
         "resolution": 24, "max_parts": 8},
    )
    assert len(cols) >= 2
