"""Host-side debug rendering: dump a scene snapshot to matplotlib.

Counterpart of the reference's gizmo-based ``PhysicsDebugPlugin``
(``debug_render/mod.rs:141-523``): AABBs, collider wireframes, contact
points/normals with impulse magnitudes, sleeping state, islands, joints.
"""

import numpy as np


def render_scene(
    world,
    path: str | None = None,
    axes=("x", "y"),
    show_aabbs=True,
    show_contacts=True,
    show_velocities=False,
    show_islands=False,
    ax=None,
):
    """Render a 2D projection of the world. Returns the matplotlib Axes."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ai = {"x": 0, "y": 1, "z": 2}
    u, v = ai[axes[0]], ai[axes[1]]

    if ax is None:
        _, ax = plt.subplots(figsize=(10, 10))

    col = world.colliders
    bodies = world.bodies
    active = np.asarray(col.active)
    lo = np.asarray(col.aabb_min)
    hi = np.asarray(col.aabb_max)
    body_idx = np.asarray(col.body_idx)
    sleeping = np.asarray(bodies.sleeping)
    island = np.asarray(bodies.island)

    if show_aabbs:
        for i in np.nonzero(active)[0]:
            if hi[i, u] - lo[i, u] > 1e8:
                continue  # skip half-spaces
            b = body_idx[i]
            if show_islands:
                color = plt.cm.tab20(island[b] % 20)
            else:
                color = "0.6" if sleeping[b] else "tab:blue"
            ax.add_patch(
                __import__("matplotlib.patches", fromlist=["Rectangle"]).Rectangle(
                    (lo[i, u], lo[i, v]),
                    hi[i, u] - lo[i, u],
                    hi[i, v] - lo[i, v],
                    fill=False,
                    edgecolor=color,
                    linewidth=0.7,
                )
            )

    if show_contacts:
        c = world.contacts
        touching = np.asarray(c.active & c.touching)
        num_pts = np.asarray(c.num_points)
        anchors = np.asarray(c.anchor_b)
        normals = np.asarray(c.normal)
        imps = np.asarray(c.max_normal_impulse)
        bpos = np.asarray(bodies.pos)
        bquat = np.asarray(bodies.quat)
        from avian_tpu.math import quat as quat_m
        import jax.numpy as jnp

        com_w = bpos + np.asarray(
            quat_m.rotate(jnp.asarray(bquat), jnp.asarray(np.asarray(bodies.com)))
        )
        for k in np.nonzero(touching)[0]:
            for p in range(int(num_pts[k])):
                pt = com_w[np.asarray(c.body_b)[k]] + anchors[k, p]
                ax.plot(pt[u], pt[v], "r.", markersize=3)
                n = normals[k] * min(0.3, 0.05 + 0.01 * imps[k, p])
                ax.plot([pt[u], pt[u] + n[u]], [pt[v], pt[v] + n[v]], "r-", lw=0.5)

    if show_velocities:
        pos = np.asarray(bodies.pos)
        vel = np.asarray(bodies.lin_vel)
        act = np.asarray(bodies.active)
        for i in np.nonzero(act)[0]:
            ax.arrow(pos[i, u], pos[i, v], vel[i, u] * 0.1, vel[i, v] * 0.1,
                     color="g", width=0.005)

    ax.set_aspect("equal")
    ax.autoscale_view()
    ax.set_xlabel(axes[0])
    ax.set_ylabel(axes[1])
    if path:
        ax.figure.savefig(path, dpi=120, bbox_inches="tight")
    return ax
