"""Benchmark / acceptance scenes mirroring the reference's bench suite and
examples (``/root/reference/benches/src/``, SURVEY.md §6 and Appendix C)."""

import math

import numpy as np

from avian_tpu.core.builder import SceneBuilder
from avian_tpu.core.types import BodyType, JointType


def cube_pile(
    n_cubes: int = 1000,
    half: float = 0.5,
    spacing: float | None = None,
    seed: int = 0,
    max_contacts: int | None = None,
):
    """N dynamic cubes arranged in a loose grid above a ground plane
    (the `cubes` example / BASELINE config 1). Returns (world, ids)."""
    rng = np.random.default_rng(seed)
    sp = spacing if spacing is not None else 2.0 * half * 1.1
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))

    side = max(1, round(n_cubes ** (1.0 / 3.0)))
    ids = []
    k = 0
    y0 = half * 1.2
    for layer in range(math.ceil(n_cubes / (side * side))):
        for i in range(side):
            for j in range(side):
                if k >= n_cubes:
                    break
                jitter = rng.uniform(-0.05, 0.05, size=2) * half
                body = b.add_body(
                    pos=(
                        (i - side / 2) * sp + jitter[0],
                        y0 + layer * sp,
                        (j - side / 2) * sp + jitter[1],
                    )
                )
                b.box(body, half, half, half, friction=0.5)
                ids.append(body)
                k += 1
    world = b.finalize(
        max_bodies=n_cubes + 1,
        max_colliders=n_cubes + 1,
        max_contacts=max_contacts or max(8 * n_cubes, 64),
    )
    return world, ids


def box_pyramid(base: int = 20, half: float = 0.5, dim3_depth: bool = False):
    """Box pyramid, the reference's `Large Pyramid` bench scene
    (``benches/src/dim2/large_pyramid.rs``). base=100 -> 5050 boxes.

    ``dim3_depth=False``: 2D profile (Z translation + X/Y rotation
    locked — avian2d's DIM=2 mode). ``dim3_depth=True``: the same planar
    layout with fully free 3D cubes — the reference's `Large Pyramid 3D`
    (``benches/src/dim3/large_pyramid.rs:25-39`` builds the identical
    single-depth pyramid with unconstrained 3D bodies)."""
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    size = 2.0 * half
    ids = []
    count = 0
    for row in range(base):
        n_in_row = base - row
        y = half + row * size
        x0 = -0.5 * n_in_row * size
        for i in range(n_in_row):
            p = (x0 + (i + 0.5) * size, y * 1.0001)
            if dim3_depth:
                body = b.add_body(pos=(p[0], p[1], 0.0))
            else:
                # True 2D profile: Z translation + X/Y rotation locked
                # (the reference's avian2d DIM=2 mode on shared source).
                body = b.add_body_2d(pos=p)
            b.box(body, half, half, half, friction=0.6)
            ids.append(body)
            count += 1
    n = count + 1
    world = b.finalize(
        max_bodies=n, max_colliders=n, max_contacts=max(8 * n, 64)
    )
    return world, ids


def joint_chain(n_links: int = 30, jtype: JointType = JointType.SPHERICAL):
    """Hanging chain of capsule links (the `chain_3d` example)."""
    b = SceneBuilder()
    anchor = b.add_body(body_type=BodyType.STATIC, pos=(0, 0, 0))
    link_len = 0.5
    r = 0.08
    prev = anchor
    ids = []
    for k in range(n_links):
        y = -(k + 0.5) * link_len
        body = b.add_body(pos=(0, y, 0))
        b.capsule(body, r, link_len - 2 * r)
        if jtype == JointType.SPHERICAL or jtype == JointType.REVOLUTE:
            b.add_joint(
                jtype,
                prev,
                body,
                anchor_a=(0, 0, 0) if prev == anchor else (0, -link_len / 2, 0),
                anchor_b=(0, link_len / 2, 0),
            )
        ids.append(body)
        prev = body
    n = n_links + 1
    world = b.finalize(
        max_bodies=n,
        max_colliders=n,
        max_contacts=max(8 * n, 64),
        max_joints=n_links,
    )
    return world, ids


def ccd_stress(n_bullets: int = 32, speed: float = 80.0):
    """Fast spheres shot at a thin wall (speculative-contact CCD stress,
    the `ccd` example / BASELINE config 4)."""
    b = SceneBuilder()
    wall = b.add_body(body_type=BodyType.STATIC, pos=(5.0, 0.0, 0.0))
    b.box(wall, 0.05, 10.0, 10.0)
    g = b.add_body(body_type=BodyType.STATIC, pos=(0, -10.0, 0))
    b.half_space(g, normal=(0, 1, 0))
    ids = []
    for k in range(n_bullets):
        body = b.add_body(
            pos=(0.0, (k % 8) * 0.5 - 2.0, (k // 8) * 0.5 - 1.0),
            lin_vel=(speed, 0.0, 0.0),
        )
        b.sphere(body, 0.1, restitution=0.1)
        ids.append(body)
    n = n_bullets + 2
    world = b.finalize(
        max_bodies=n, max_colliders=n, max_contacts=max(8 * n, 64)
    )
    return world, ids


def falling_hinges(rows: int = 30, cols: int = 4, half: float = 0.25):
    """Port of Box2D's FallingHinges determinism scene (the reference's
    cross-platform determinism test, ``src/tests/determinism_2d.rs:28-60``):
    ``rows x cols`` falling boxes, each column pair linked by revolute
    hinges, over a ground plane. 2D profile (locked axes)."""
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    size = 2.0 * half
    ids = []
    n_joints = 0
    for r in range(rows):
        prev = None
        for c in range(cols):
            body = b.add_body_2d(
                pos=(c * size * 1.05 - 0.5 * cols * size, 2.0 + r * size * 1.2)
            )
            b.box(body, half, half, half, friction=0.6)
            ids.append(body)
            if prev is not None:
                b.add_joint(
                    JointType.REVOLUTE, prev, body,
                    anchor_a=(half, half, 0.0), anchor_b=(-half, half, 0.0),
                    basis_a=(0.0, 0.0, 0.0, 1.0), basis_b=(0.0, 0.0, 0.0, 1.0),
                )
                n_joints += 1
            prev = body
    n = rows * cols + 1
    world = b.finalize(
        max_bodies=n, max_colliders=n, max_contacts=max(8 * n, 64),
        max_joints=max(n_joints, 1),
    )
    return world, ids


def many_pyramids(grid: int = 10, base: int = 10, half: float = 0.5,
                  dim3: bool = False):
    """The reference's `Many Pyramids` bench scene: a ``grid x grid``
    field of base-``base`` pyramids (10x10 x base-10 -> 5500 boxes,
    ``benches/src/dim2/mod.rs:21-24``). ``dim3=False``: 2D locked-axes
    profile, pyramids tiled in the XY plane. ``dim3=True``: the 3D
    variant (``benches/src/dim3/mod.rs:21-24``) — fully free 3D cubes,
    pyramids tiled over the XZ ground plane."""
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    size = 2.0 * half
    spacing_x = base * size + 2.0
    ids = []
    for gx in range(grid):
        for gy in range(grid):
            x_off = (gx - grid / 2) * spacing_x
            y_off = 0.0 if dim3 else gy * (base * size + 1.0)
            z_off = (gy - grid / 2) * 4.0 if dim3 else 0.0
            for row in range(base):
                n_in_row = base - row
                y = half + row * size + y_off
                x0 = x_off - 0.5 * n_in_row * size
                for i in range(n_in_row):
                    p = (x0 + (i + 0.5) * size, y * 1.0001)
                    if dim3:
                        body = b.add_body(pos=(p[0], p[1], z_off))
                    else:
                        body = b.add_body_2d(pos=p)
                    b.box(body, half, half, half, friction=0.6)
                    ids.append(body)
    n = len(ids) + 1
    world = b.finalize(
        max_bodies=n, max_colliders=n, max_contacts=max(8 * n, 64)
    )
    return world, ids
