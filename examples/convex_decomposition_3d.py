"""Convex decomposition colliders (counterpart of the reference's
`Collider::convex_decomposition`,
`/root/reference/src/collision/collider/parry/mod.rs:962-990`, which
Parry implements with VHACD).

A concave L-shaped prism mesh — which no single convex collider can
represent — is decomposed into approximately-convex parts by the native
C++ kernel in ``avian_tpu.native`` (numpy fallback when no compiler is
present) and attached to ONE dynamic body as a compound of convex hulls.
Dropped onto the ground it must land on its flat bottom and rest there,
with the concave elbow preserved: a ball dropped into the elbow pocket
settles BELOW the prism tops (a single convex hull of the L would bridge
the pocket and hold the ball up).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step


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
    """L-shaped prism: arms along +x and +z, 0.5 thick in y, centered on
    the body origin in x/z."""
    v1, f1 = box_mesh([-1.0, 0.0, -1.0], [1.0, 0.5, -0.5])
    v2, f2 = box_mesh([-1.0, 0.0, -1.0], [-0.5, 0.5, 1.0])
    return np.concatenate([v1, v2]), np.concatenate([f1, f2 + 8])


def main():
    V, F = l_mesh()

    b = SceneBuilder()
    ground = b.add_body(body_type=BodyType.STATIC)
    b.half_space(ground, normal=(0, 1, 0))

    body = b.add_body(pos=(0.0, 1.0, 0.0))
    cols = b.convex_decomposition(body, V, F, resolution=32, max_parts=8)
    assert len(cols) >= 2, (
        f"L-shape must decompose into >= 2 hulls, got {len(cols)}"
    )

    # a marble aimed into the concave elbow pocket
    ball = b.add_body(pos=(0.0, 2.5, 0.0))
    b.sphere(ball, 0.2)

    w = b.finalize(max_bodies=16, max_colliders=32, max_contacts=512)
    cfg = PhysicsConfig(max_colors=8)

    def one(w, _):
        return physics_step(w, cfg), None

    w = jax.jit(lambda w: jax.lax.scan(one, w, None, length=400)[0])(w)

    pos = np.asarray(w.bodies.pos)
    assert np.isfinite(pos).all(), "diverged"
    # The L rests flat on the ground: its local mesh spans y in [0, 0.5],
    # so the body origin sits at the plane (within contact tolerance /
    # voxel-hull inflation), and it did not fall through.
    l_y = pos[body, 1]
    assert -0.05 < l_y < 0.25, f"L prism rest height {l_y}"
    # The marble fell into the elbow pocket — a point INSIDE the L's
    # convex hull (x + z < 0.5) — all the way to the ground plane,
    # proving the compound preserved the concavity: a single convex hull
    # would bridge the pocket and hold the ball near y = 0.7.
    ball_y = pos[ball, 1]
    assert 0.1 < ball_y < 0.45, f"marble height {ball_y} (pocket missed)"
    from avian_tpu import native

    print(
        f"convex_decomposition_3d: {len(cols)} hulls "
        f"(native={native.native_available()}), L rest y={l_y:.3f}, "
        f"marble in pocket y={ball_y:.3f}"
    )


if __name__ == "__main__":
    main()
