"""2D benchmark / test scenes (native 2D profile).

The reference's 2D bench scenes (``benches/src/dim2/mod.rs:17-24``) on the
dedicated 2D path — compare with ``avian_tpu.scenes.box_pyramid`` (the same
scene on the 3D locked-axes path) for the 2D-profile speedup.
"""

from avian_tpu.core.types import BodyType
from avian_tpu.dim2.builder import SceneBuilder2D


def box_pyramid_2d(base: int = 100, half: float = 0.5):
    """Large Pyramid 2D: base..1 rows -> base*(base+1)/2 boxes
    (``benches/src/dim2/large_pyramid.rs:6-39``)."""
    b = SceneBuilder2D()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1), friction=0.6)
    ids = []
    for row in range(base):
        cols = base - row
        for c in range(cols):
            x = (c - cols / 2.0) * 1.001 * 2 * half
            y = half * 1.001 + row * 2 * half * 1.001
            body = b.add_body(pos=(x, y))
            b.box(body, half, half, friction=0.6)
            ids.append(body)
    n = len(ids) + 1
    world = b.finalize(
        max_bodies=n, max_colliders=n, max_contacts=max(8 * n, 64)
    )
    return world, ids


def many_pyramids_2d(grid: int = 10, base: int = 10, half: float = 0.5):
    """Many Pyramids 2D: ``grid x grid`` field of base-``base`` pyramids
    (``benches/src/dim2/mod.rs:17-24``)."""
    b = SceneBuilder2D()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1), friction=0.6)
    ids = []
    spacing = (base + 4) * 2 * half
    for gx in range(grid * grid):
        ox = (gx - grid * grid / 2.0) * spacing
        for row in range(base):
            cols = base - row
            for c in range(cols):
                x = ox + (c - cols / 2.0) * 1.001 * 2 * half
                y = half * 1.001 + row * 2 * half * 1.001
                body = b.add_body(pos=(x, y))
                b.box(body, half, half, friction=0.6)
                ids.append(body)
    n = len(ids) + 1
    world = b.finalize(
        max_bodies=n, max_colliders=n, max_contacts=max(8 * n, 64)
    )
    return world, ids
