"""Host-side debug rendering: dump a scene snapshot to matplotlib.

Counterpart of the reference's gizmo-based ``PhysicsDebugPlugin``
(``debug_render/mod.rs:141-523``): AABBs, collider wireframes (per-shape,
``:252-344``), contact points/normals with impulse magnitudes (``:352-431``),
joint anchor lines (``:434-471``), raycast/shapecast gizmos (``:474-523``),
velocities, sleeping state, islands.
"""

import math

import numpy as np


def _rot_np(quat, v):
    """Rotate [*, 3] by quaternion [*, 4] (x, y, z, w), numpy host-side."""
    q = np.asarray(quat, np.float64)
    v = np.asarray(v, np.float64)
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * np.cross(xyz, v)
    return v + w * t + np.cross(xyz, t)


def _shape_wire_points(shape_type, params, pool):
    """Local-space wireframe polyline list for one collider."""
    from avian_tpu.core.types import ShapeType

    st = int(shape_type)
    p = np.asarray(params, np.float64)
    lines = []
    circ = lambda r, n=24: np.stack(
        [
            r * np.cos(np.linspace(0, 2 * math.pi, n)),
            r * np.sin(np.linspace(0, 2 * math.pi, n)),
            np.zeros(n),
        ],
        axis=-1,
    )
    if st == ShapeType.SPHERE:
        r = p[0]
        for perm in ((0, 1, 2), (0, 2, 1), (2, 0, 1)):
            lines.append(circ(r)[:, list(perm)])
    elif st == ShapeType.BOX:
        hx, hy, hz = p[0], p[1], p[2]
        corners = np.array(
            [
                [sx * hx, sy * hy, sz * hz]
                for sx in (-1, 1)
                for sy in (-1, 1)
                for sz in (-1, 1)
            ]
        )
        edges = [
            (0, 1), (0, 2), (0, 4), (1, 3), (1, 5), (2, 3), (2, 6),
            (3, 7), (4, 5), (4, 6), (5, 7), (6, 7),
        ]
        for a, b in edges:
            lines.append(corners[[a, b]])
    elif st == ShapeType.CAPSULE:
        h, r = p[0], p[1]
        c = circ(r)
        lines.append(c + [0, h, 0])
        lines.append(c + [0, -h, 0])
        for ang in np.linspace(0, 2 * math.pi, 8, endpoint=False):
            x, z = r * math.cos(ang), r * math.sin(ang)
            lines.append(np.array([[x, -h, z], [x, h, z]]))
    elif st == ShapeType.CYLINDER or st == ShapeType.CONE:
        h, r = p[0], p[1]
        base = circ(r)[:, [0, 2, 1]] + [0, -h, 0]
        lines.append(base)
        if st == ShapeType.CYLINDER:
            lines.append(base + [0, 2 * h, 0])
            for ang in np.linspace(0, 2 * math.pi, 8, endpoint=False):
                x, z = r * math.cos(ang), r * math.sin(ang)
                lines.append(np.array([[x, -h, z], [x, h, z]]))
        else:
            apex = np.array([0, h, 0])
            for ang in np.linspace(0, 2 * math.pi, 8, endpoint=False):
                x, z = r * math.cos(ang), r * math.sin(ang)
                lines.append(np.stack([np.array([x, -h, z]), apex]))
    elif st == ShapeType.PLANE:
        n = p[:3]
        a = np.cross(n, [1.0, 0.0, 0.0])
        if np.linalg.norm(a) < 1e-6:
            a = np.cross(n, [0.0, 1.0, 0.0])
        a /= max(np.linalg.norm(a), 1e-9)
        b = np.cross(n, a)
        for s in np.linspace(-10, 10, 9):
            lines.append(np.stack([a * s - b * 10, a * s + b * 10]))
            lines.append(np.stack([b * s - a * 10, b * s + a * 10]))
    elif st == ShapeType.CONVEX and pool is not None:
        off, cnt = int(p[0]), int(p[1])
        verts = np.asarray(pool[off:off + cnt], np.float64)
        # Wireframe: fan of edges between consecutive pool verts (cheap,
        # shows extent; exact hull edges would need the face list).
        for i in range(len(verts)):
            lines.append(verts[[i, (i + 1) % len(verts)]])
    return lines


def render_scene(
    world,
    path: str | None = None,
    axes=("x", "y"),
    show_aabbs=False,
    show_colliders=True,
    show_contacts=True,
    show_joints=True,
    show_velocities=False,
    show_islands=False,
    ax=None,
):
    """Render a 2D projection of the world. Returns the matplotlib Axes."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

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

    def body_color(b):
        if show_islands:
            return plt.cm.tab20(island[b] % 20)
        return "0.6" if sleeping[b] else "tab:blue"

    if show_aabbs:
        for i in np.nonzero(active)[0]:
            if hi[i, u] - lo[i, u] > 1e8:
                continue  # skip half-spaces
            ax.add_patch(
                Rectangle(
                    (lo[i, u], lo[i, v]),
                    hi[i, u] - lo[i, u],
                    hi[i, v] - lo[i, v],
                    fill=False,
                    edgecolor=body_color(body_idx[i]),
                    linewidth=0.7,
                )
            )

    if show_colliders:
        # Collider wireframes (``debug_render/mod.rs:252-344``).
        from avian_tpu.pipeline.broadphase import update_collider_poses

        pos, quat = update_collider_poses(world)
        pos = np.asarray(pos)
        quat = np.asarray(quat)
        st_arr = np.asarray(col.shape_type)
        prm = np.asarray(col.params)
        pool = (
            np.asarray(world.convex_verts)
            if world.convex_verts is not None
            else None
        )
        for i in np.nonzero(active)[0]:
            for line in _shape_wire_points(st_arr[i], prm[i], pool):
                w_line = _rot_np(quat[i], line) + pos[i]
                ax.plot(
                    w_line[:, u], w_line[:, v],
                    color=body_color(body_idx[i]), lw=0.7,
                )

    if show_contacts:
        c = world.contacts
        touching = np.asarray(c.active & c.touching)
        num_pts = np.asarray(c.num_points)
        anchors = np.asarray(c.anchor_b)
        normals = np.asarray(c.normal)
        imps = np.asarray(c.max_normal_impulse)
        com_w = np.asarray(bodies.pos) + _rot_np(
            np.asarray(bodies.quat), np.asarray(bodies.com)
        )
        for k in np.nonzero(touching)[0]:
            for p in range(int(num_pts[k])):
                pt = com_w[np.asarray(c.body_b)[k]] + anchors[k, p]
                ax.plot(pt[u], pt[v], "r.", markersize=3)
                n = normals[k] * min(0.3, 0.05 + 0.01 * imps[k, p])
                ax.plot(
                    [pt[u], pt[u] + n[u]], [pt[v], pt[v] + n[v]], "r-", lw=0.5
                )

    if show_joints:
        # Joint gizmos (``debug_render/mod.rs:434-471``): anchor-to-anchor
        # lines + anchor markers.
        j = world.joints
        j_active = np.asarray(j.active)
        if j_active.any():
            bpos = np.asarray(bodies.pos)
            bquat = np.asarray(bodies.quat)
            a_idx = np.asarray(j.body_a)
            b_idx = np.asarray(j.body_b)
            fa = np.asarray(j.frame_pos_a)
            fb = np.asarray(j.frame_pos_b)
            for k in np.nonzero(j_active)[0]:
                pa = bpos[a_idx[k]] + _rot_np(bquat[a_idx[k]], fa[k])
                pb = bpos[b_idx[k]] + _rot_np(bquat[b_idx[k]], fb[k])
                ax.plot(
                    [pa[u], pb[u]], [pa[v], pb[v]], color="tab:orange",
                    lw=1.2,
                )
                ax.plot(
                    [pa[u], pb[u]], [pa[v], pb[v]], "o",
                    color="tab:orange", markersize=3,
                )

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


def render_scene_2d(
    world,
    path: str | None = None,
    show_aabbs=False,
    show_colliders=True,
    show_contacts=True,
    show_joints=True,
    show_velocities=False,
    show_islands=False,
    ax=None,
):
    """Render a :class:`~avian_tpu.dim2.state.World2D` snapshot (the
    ``avian2d`` debug-render counterpart, ``debug_render/mod.rs:141-523``).
    Rounded colliders draw their core polygon plus a circle at each vertex
    of radius ``radius`` (exact for circles/capsule caps)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Circle, Rectangle

    if ax is None:
        _, ax = plt.subplots(figsize=(10, 10))

    col = world.colliders
    bodies = world.bodies
    active = np.asarray(col.active)
    body_idx = np.asarray(col.body_idx)
    sleeping = np.asarray(bodies.sleeping)
    island = np.asarray(bodies.island)

    def body_color(b):
        if show_islands:
            return plt.cm.tab20(island[b] % 20)
        return "0.6" if sleeping[b] else "tab:blue"

    if show_aabbs:
        lo = np.asarray(col.aabb_min)
        hi = np.asarray(col.aabb_max)
        for i in np.nonzero(active)[0]:
            if hi[i, 0] - lo[i, 0] > 1e8:
                continue  # half-spaces
            ax.add_patch(
                Rectangle(
                    (lo[i, 0], lo[i, 1]), hi[i, 0] - lo[i, 0],
                    hi[i, 1] - lo[i, 1], fill=False,
                    edgecolor=body_color(body_idx[i]), linewidth=0.7,
                )
            )

    if show_colliders:
        from avian_tpu.dim2.broadphase import update_collider_poses

        pos, angle = update_collider_poses(world)
        pos = np.asarray(pos)
        angle = np.asarray(angle)
        verts = np.asarray(col.poly_verts)
        counts = np.asarray(col.vert_count)
        radii = np.asarray(col.radius)
        is_plane = np.asarray(col.is_plane)
        for i in np.nonzero(active)[0]:
            color = body_color(body_idx[i])
            c, s = np.cos(angle[i]), np.sin(angle[i])
            rot = np.asarray([[c, -s], [s, c]], np.float32)
            if is_plane[i]:
                n = rot @ verts[i, 0]
                t = np.asarray([-n[1], n[0]])
                p0, p1 = pos[i] - 50 * t, pos[i] + 50 * t
                ax.plot([p0[0], p1[0]], [p0[1], p1[1]], color=color, lw=1.0)
                continue
            k = int(counts[i])
            wv = verts[i, :k] @ rot.T + pos[i]
            if k >= 2:
                loop = np.vstack([wv, wv[:1]]) if k >= 3 else wv
                ax.plot(loop[:, 0], loop[:, 1], color=color, lw=0.8)
            if radii[i] > 1e-9:
                for p in wv:
                    ax.add_patch(
                        Circle(p, radii[i], fill=False, edgecolor=color,
                               linewidth=0.8)
                    )

    if show_contacts:
        c2 = world.contacts
        touching = np.asarray(c2.active & c2.touching)
        num_pts = np.asarray(c2.num_points)
        anchors = np.asarray(c2.anchor_b)
        normals = np.asarray(c2.normal)
        imps = np.asarray(c2.max_normal_impulse)
        ang = np.asarray(bodies.angle)
        ca, sa = np.cos(ang), np.sin(ang)
        com_l = np.asarray(bodies.com)
        com_w = np.asarray(bodies.pos) + np.stack(
            [ca * com_l[:, 0] - sa * com_l[:, 1],
             sa * com_l[:, 0] + ca * com_l[:, 1]], axis=-1
        )
        b_idx = np.asarray(c2.body_b)
        for k in np.nonzero(touching)[0]:
            for p in range(int(num_pts[k])):
                pt = com_w[b_idx[k]] + anchors[k, p]
                ax.plot(pt[0], pt[1], "r.", markersize=3)
                n = normals[k] * min(0.3, 0.05 + 0.01 * imps[k, p])
                ax.plot([pt[0], pt[0] + n[0]], [pt[1], pt[1] + n[1]],
                        "r-", lw=0.5)

    if show_joints:
        j = world.joints
        j_active = np.asarray(j.active)
        if j_active.any():
            bpos = np.asarray(bodies.pos)
            ang = np.asarray(bodies.angle)
            for k in np.nonzero(j_active)[0]:
                ia, ib = int(np.asarray(j.body_a)[k]), int(np.asarray(j.body_b)[k])

                def to_world(i, anchor):
                    c, s = np.cos(ang[i]), np.sin(ang[i])
                    return bpos[i] + np.asarray(
                        [c * anchor[0] - s * anchor[1],
                         s * anchor[0] + c * anchor[1]]
                    )

                pa = to_world(ia, np.asarray(j.anchor_a)[k])
                pb = to_world(ib, np.asarray(j.anchor_b)[k])
                ax.plot([pa[0], pb[0]], [pa[1], pb[1]], color="tab:orange",
                        lw=1.2)
                ax.plot([pa[0], pb[0]], [pa[1], pb[1]], "o",
                        color="tab:orange", markersize=3)

    if show_velocities:
        pos = np.asarray(bodies.pos)
        vel = np.asarray(bodies.lin_vel)
        act = np.asarray(bodies.active)
        for i in np.nonzero(act)[0]:
            ax.arrow(pos[i, 0], pos[i, 1], vel[i, 0] * 0.1, vel[i, 1] * 0.1,
                     color="g", width=0.005)

    ax.set_aspect("equal")
    ax.autoscale_view()
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    if path:
        ax.figure.savefig(path, dpi=120, bbox_inches="tight")
    return ax


def draw_ray(ax, origin, hit, axes=("x", "y"), color="tab:purple"):
    """Raycast gizmo (``debug_render/mod.rs:474-497``): origin-to-hit line,
    hit point + normal. ``hit`` is a ``queries.RayHit``."""
    ai = {"x": 0, "y": 1, "z": 2}
    u, v = ai[axes[0]], ai[axes[1]]
    o = np.asarray(origin, np.float64)
    p = np.asarray(hit.point)
    ax.plot([o[u], p[u]], [o[v], p[v]], color=color, lw=0.9)
    if bool(np.asarray(hit.hit)):
        n = np.asarray(hit.normal) * 0.3
        ax.plot(p[u], p[v], "o", color=color, markersize=4)
        ax.plot([p[u], p[u] + n[u]], [p[v], p[v] + n[v]], color=color, lw=0.9)
    return ax


def draw_shape_cast(ax, origin, direction, hit, axes=("x", "y"),
                    color="tab:green"):
    """Shapecast gizmo (``debug_render/mod.rs:500-523``): travel line to the
    impact pose + contact point/normal. ``hit`` is a ``queries.ShapeHit``."""
    ai = {"x": 0, "y": 1, "z": 2}
    u, v = ai[axes[0]], ai[axes[1]]
    o = np.asarray(origin, np.float64)
    d = np.asarray(direction, np.float64)
    t = float(np.asarray(hit.distance)) if bool(np.asarray(hit.hit)) else 0.0
    end = o + d * t
    ax.plot([o[u], end[u]], [o[v], end[v]], color=color, lw=0.9, ls="--")
    if bool(np.asarray(hit.hit)):
        p = np.asarray(hit.point)
        n = np.asarray(hit.normal) * 0.3
        ax.plot(p[u], p[v], "o", color=color, markersize=4)
        ax.plot([p[u], p[u] + n[u]], [p[v], p[v] + n[v]], color=color, lw=0.9)
    return ax
