"""Host-side scene construction — the ``commands.spawn`` analogue.

Builds the fixed-capacity SoA ``World`` from Python-level body/collider/joint
descriptions (reference spawn path: SURVEY.md §3.2). Mass properties are
auto-computed from collider shape + density unless overridden, mirroring the
reference's ``MassPropertyPlugin`` (``mass_properties/mod.rs:256-341``).

Everything here is numpy on the host; the result is a device pytree.
"""

import math as _math

import numpy as np
import jax.numpy as jnp

from avian_tpu.core.state import World
from avian_tpu.core.types import BodyType, JointType, ShapeType
from avian_tpu.geometry import shapes as shapes_m
from avian_tpu.math import sym3

_INF = float("inf")


def _quat_np(q):
    q = np.asarray(q, np.float32)
    return q / max(float(np.linalg.norm(q)), 1e-12)




# ---------------------------------------------------------------------------
# Host-side (numpy) mass-property math. The jnp versions in geometry.shapes
# are for on-device use; the builder must stay off-device because
# device->host transfers are expensive on tunneled TPU runtimes.
# ---------------------------------------------------------------------------

_PI = float(np.pi)


def _mass_properties_np(st, pr, dens):
    from avian_tpu.core.types import ShapeType

    r = pr[:, 0]
    hx, hy, hz = pr[:, 0], pr[:, 1], pr[:, 2]
    ch, cr = pr[:, 0], pr[:, 1]
    H = 2.0 * ch

    mass = np.zeros_like(r)
    i3 = np.zeros((r.shape[0], 3), np.float32)

    sph = st == ShapeType.SPHERE
    m = dens * (4.0 / 3.0) * _PI * r**3
    mass = np.where(sph, m, mass)
    i3 = np.where(sph[:, None], (0.4 * m * r * r)[:, None] * np.ones(3, np.float32), i3)

    box = st == ShapeType.BOX
    m = dens * 8.0 * hx * hy * hz
    ib = np.stack([hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy], -1) * (m / 3.0)[:, None]
    mass = np.where(box, m, mass)
    i3 = np.where(box[:, None], ib, i3)

    cap = st == ShapeType.CAPSULE
    m_cyl = dens * _PI * cr * cr * H
    m_hem = dens * (4.0 / 3.0) * _PI * cr**3
    m = m_cyl + m_hem
    iy = m_cyl * cr * cr * 0.5 + m_hem * 0.4 * cr * cr
    ix = m_cyl * (H * H / 12.0 + cr * cr / 4.0) + m_hem * (0.4 * cr * cr + H * H / 4.0 + 0.375 * H * cr)
    mass = np.where(cap, m, mass)
    i3 = np.where(cap[:, None], np.stack([ix, iy, ix], -1), i3)

    cyl = st == ShapeType.CYLINDER
    m = dens * _PI * cr * cr * H
    iy = 0.5 * m * cr * cr
    ix = m * (3.0 * cr * cr + H * H) / 12.0
    mass = np.where(cyl, m, mass)
    i3 = np.where(cyl[:, None], np.stack([ix, iy, ix], -1), i3)

    cone = st == ShapeType.CONE
    m = dens * _PI * cr * cr * H / 3.0
    iy = 0.3 * m * cr * cr
    ix = m * (3.0 / 20.0 * cr * cr + 3.0 / 80.0 * H * H)
    mass = np.where(cone, m, mass)
    i3 = np.where(cone[:, None], np.stack([ix, iy, ix], -1), i3)

    i6 = np.concatenate([i3, np.zeros_like(i3)], -1).astype(np.float32)
    com = np.zeros((r.shape[0], 3), np.float32)
    com[:, 1] = np.where(cone, -0.5 * pr[:, 0], 0.0)
    return mass.astype(np.float32), i6, com


def _hull_mass_props_np(pts, hull, density):
    """Exact convex-polyhedron mass properties by signed tetrahedron
    decomposition (covariance method; what Parry computes for
    ``Collider::convex_hull``). Returns (mass, inertia sym6 about the COM,
    com)."""
    C_can = np.full((3, 3), 1.0 / 120.0)
    np.fill_diagonal(C_can, 1.0 / 60.0)
    vol = 0.0
    first = np.zeros(3)
    C = np.zeros((3, 3))
    for fi, simplex in enumerate(hull.simplices):
        a, b, c = pts[simplex]
        # qhull does NOT orient simplices consistently; flip each so its
        # winding matches the outward face normal from `equations`.
        n_out = hull.equations[fi, :3]
        if np.dot(n_out, np.cross(b - a, c - a)) < 0.0:
            b, c = c, b
        A = np.stack([a, b, c], axis=1)
        det = np.linalg.det(A)
        vol += det / 6.0
        first += det / 6.0 * (a + b + c) / 4.0
        C += det * (A @ C_can @ A.T)
    vol = abs(vol) if vol != 0 else 1e-12
    com = first / vol
    mass = density * vol
    C = density * C - mass * np.outer(com, com)
    eye = np.eye(3)
    inertia = np.trace(C) * eye - C
    i6 = np.asarray(
        [inertia[0, 0], inertia[1, 1], inertia[2, 2],
         inertia[0, 1], inertia[0, 2], inertia[1, 2]], np.float32
    )
    return np.float32(mass), i6, com.astype(np.float32)


def _shift_inertia_np(i6, mass, d):
    d2 = np.sum(d * d, axis=-1)
    shift = np.stack(
        [
            d2 - d[:, 0] * d[:, 0],
            d2 - d[:, 1] * d[:, 1],
            d2 - d[:, 2] * d[:, 2],
            -d[:, 0] * d[:, 1],
            -d[:, 0] * d[:, 2],
            -d[:, 1] * d[:, 2],
        ],
        -1,
    )
    return i6 + shift * mass[:, None]


def _sym3_inverse_np(s):
    a, b, c = s[:, 0], s[:, 1], s[:, 2]
    d, e, f = s[:, 3], s[:, 4], s[:, 5]
    ca = b * c - f * f
    cb = a * c - e * e
    cc = a * b - d * d
    cd = e * f - d * c
    ce = d * f - e * b
    cf = d * e - a * f
    det = a * ca + d * cd + e * ce
    inv_det = np.where(det != 0.0, 1.0 / np.where(det == 0.0, 1.0, det), 0.0)
    return np.stack([ca, cb, cc, cd, ce, cf], -1) * inv_det[:, None]


class SceneBuilder:
    """Accumulates bodies/colliders/joints, then ``finalize()``s to a World."""

    def __init__(self):
        self._bodies = []
        self._colliders = []
        self._joints = []
        self._convex_verts = []  # list of np [k, 3] vertex blocks
        # Running pool length: computing it by summing the list is O(F^2)
        # over a 100k-face trimesh build (the round-2 "minutes of host
        # build" — VERDICT weak #6).
        self._convex_verts_len = 0
        self._custom_shapes = []  # CustomShape instances, index = code base
        self.gravity = (0.0, -9.81, 0.0)

    # ------------------------------------------------------------------
    def add_body(
        self,
        body_type: BodyType = BodyType.DYNAMIC,
        pos=(0.0, 0.0, 0.0),
        quat=(0.0, 0.0, 0.0, 1.0),
        lin_vel=(0.0, 0.0, 0.0),
        ang_vel=(0.0, 0.0, 0.0),
        mass: float | None = None,
        inertia=None,  # length-3 principal diagonal or sym6, local frame
        com=None,
        gravity_scale: float = 1.0,
        lin_damping: float = 0.0,
        ang_damping: float = 0.0,
        max_lin_speed: float = _INF,
        max_ang_speed: float = _INF,
        dominance: int = 0,
        locked_axes: int = 0,
        gyroscopic: bool = False,
        swept_ccd: bool = False,
        swept_ccd_nonlinear: bool = False,
        sleep_disabled: bool = False,
    ) -> int:
        """Returns the body index."""
        self._bodies.append(
            dict(
                body_type=int(body_type),
                pos=np.asarray(pos, np.float32),
                quat=_quat_np(quat),
                lin_vel=np.asarray(lin_vel, np.float32),
                ang_vel=np.asarray(ang_vel, np.float32),
                mass=mass,
                inertia=inertia,
                com=com,
                gravity_scale=gravity_scale,
                lin_damping=lin_damping,
                ang_damping=ang_damping,
                max_lin_speed=max_lin_speed,
                max_ang_speed=max_ang_speed,
                dominance=dominance,
                locked_axes=locked_axes,
                gyroscopic=gyroscopic,
                swept_ccd=swept_ccd,
                swept_ccd_nonlinear=swept_ccd_nonlinear,
                sleep_disabled=sleep_disabled,
            )
        )
        return len(self._bodies) - 1

    def add_body_2d(self, pos=(0.0, 0.0), angle: float = 0.0, **kw) -> int:
        """A body constrained to the XY plane (the 2D mode: translation Z
        and rotation X/Y locked — behaviorally the reference's ``avian2d``
        with the shared 3D source, ``crates/avian2d``). ``pos`` is (x, y)."""
        from avian_tpu.core import types as _t

        locked = kw.pop("locked_axes", 0) | _t.LOCK_TZ | _t.LOCK_RX | _t.LOCK_RY
        q = (0.0, 0.0, _math.sin(angle / 2), _math.cos(angle / 2))
        return self.add_body(
            pos=(pos[0], pos[1], 0.0), quat=q, locked_axes=locked, **kw
        )

    # ------------------------------------------------------------------
    def add_collider(
        self,
        body: int,
        shape: ShapeType,
        params,
        local_pos=(0.0, 0.0, 0.0),
        local_quat=(0.0, 0.0, 0.0, 1.0),
        friction: float = 0.5,
        static_friction: float | None = None,
        restitution: float = 0.0,
        friction_combine: int = 0,
        restitution_combine: int = 0,
        density: float = 1.0,
        layer_members: int = 0xFFFFFFFF,
        layer_filter: int = 0xFFFFFFFF,
        is_sensor: bool = False,
        collision_margin: float = 0.0,
        speculative_margin: float = _INF,
        _hull_cache=None,
        _mass_cache=None,
    ) -> int:
        # Loud failure for shapes with no narrowphase support: a collider
        # that silently produces no contacts falls through the world.
        supported = (
            ShapeType.SPHERE,
            ShapeType.CAPSULE,
            ShapeType.BOX,
            ShapeType.PLANE,
            ShapeType.CYLINDER,
            ShapeType.CONE,
            ShapeType.SEGMENT,
            ShapeType.CONVEX,
        )
        from avian_tpu.api.custom_shapes import CUSTOM_SHAPE_BASE

        if int(shape) < CUSTOM_SHAPE_BASE and (
            ShapeType(int(shape)) not in supported
        ):
            raise ValueError(
                f"shape {ShapeType(int(shape)).name} has no narrowphase "
                f"support yet; supported: "
                f"{', '.join(s.name for s in supported)} "
                f"(or a CustomShape via custom_collider)"
            )
        p = np.zeros(8, np.float32)
        pa = np.asarray(params, np.float32).reshape(-1)
        p[: pa.shape[0]] = pa
        self._colliders.append(
            dict(
                body=body,
                shape=int(shape),
                params=p,
                local_pos=np.asarray(local_pos, np.float32),
                local_quat=_quat_np(local_quat),
                friction=friction,
                # Reference Friction: one coefficient sets both unless the
                # static one is overridden (physics_material.rs:171-177).
                static_friction=(
                    friction if static_friction is None else static_friction
                ),
                restitution=restitution,
                friction_combine=friction_combine,
                restitution_combine=restitution_combine,
                density=density,
                layer_members=layer_members,
                layer_filter=layer_filter,
                is_sensor=is_sensor,
                collision_margin=collision_margin,
                speculative_margin=speculative_margin,
                hull_cache=_hull_cache,
                mass_cache=_mass_cache,
            )
        )
        return len(self._colliders) - 1

    # Convenience constructors mirroring the reference's Collider API.
    def sphere(self, body, radius, **kw):
        return self.add_collider(body, ShapeType.SPHERE, (radius,), **kw)

    def box(self, body, hx, hy, hz, **kw):
        return self.add_collider(body, ShapeType.BOX, (hx, hy, hz), **kw)

    def cuboid(self, body, x_len, y_len, z_len, **kw):
        return self.box(body, x_len / 2, y_len / 2, z_len / 2, **kw)

    def capsule(self, body, radius, length, **kw):
        return self.add_collider(body, ShapeType.CAPSULE, (length / 2, radius), **kw)

    def half_space(self, body, normal=(0.0, 1.0, 0.0), **kw):
        n = np.asarray(normal, np.float32)
        n = n / max(float(np.linalg.norm(n)), 1e-12)
        return self.add_collider(body, ShapeType.PLANE, tuple(n), **kw)

    def cylinder(self, body, radius, height, **kw):
        return self.add_collider(body, ShapeType.CYLINDER, (height / 2, radius), **kw)

    def cone(self, body, radius, height, **kw):
        """Cone with base disc at local y=-height/2, apex at +height/2."""
        return self.add_collider(body, ShapeType.CONE, (height / 2, radius), **kw)

    def segment(self, body, a, b, **kw):
        """Segment collider between world-of-body-local endpoints ``a`` and
        ``b`` (reference ``Collider::segment``, ``parry/mod.rs:817``).
        Zero-volume: massless, meant for static geometry / sensors.

        Stored canonically as a half-length on the local X axis, with the
        collider's local transform carrying the midpoint and orientation.
        """
        a = np.asarray(a, np.float32)
        bb = np.asarray(b, np.float32)
        mid = (a + bb) / 2.0
        d = bb - a
        length = float(np.linalg.norm(d))
        if length < 1e-9:
            raise ValueError("segment endpoints coincide")
        dn = d / length
        # Quaternion rotating local +X onto the segment direction.
        x = np.asarray([1.0, 0.0, 0.0], np.float32)
        c = float(np.dot(x, dn))
        axis = np.cross(x, dn)
        s = float(np.linalg.norm(axis))
        if s < 1e-9:
            q = (
                np.asarray([0, 0, 0, 1], np.float32)
                if c > 0
                else np.asarray([0, 0, 1, 0], np.float32)  # 180 deg about Z
            )
        else:
            axis = axis / s
            half = 0.5 * np.arctan2(s, c)
            q = np.asarray([*(np.sin(half) * axis), np.cos(half)], np.float32)
        lp = np.asarray(kw.pop("local_pos", (0.0, 0.0, 0.0)), np.float32)
        return self.add_collider(
            body, ShapeType.SEGMENT, (length / 2.0,),
            local_pos=tuple(lp + mid), local_quat=tuple(q), **kw,
        )

    def round_cuboid(self, body, x_len, y_len, z_len, border_radius, **kw):
        """Cuboid with rounded edges/corners: Minkowski sum of an inner box
        (half extents = lengths/2) and a sphere of ``border_radius``
        (reference ``Collider::round_cuboid``, ``parry/mod.rs:763-777``).

        Implemented as a round convex hull: the 8 inner corners go in the
        vertex pool and params lane 6 carries the radius — support grows by
        ``r*d_hat``, patches lift by ``r`` (``geometry/convex.py``), the
        raycast kernel traces the inflated surface. Mass properties use the
        exact Steiner volume of the rounded solid with the inertia of the
        bounding box of that volume (slight overestimate concentrated at
        the rounded corners; exact at r=0).
        """
        hx, hy, hz = x_len / 2.0, y_len / 2.0, z_len / 2.0
        r = float(border_radius)
        if r < 0.0 or min(hx, hy, hz) <= 0.0:
            raise ValueError("round_cuboid needs positive extents, r >= 0")
        corners = np.asarray(
            [
                (sx * hx, sy * hy, sz * hz)
                for sx in (-1.0, 1.0)
                for sy in (-1.0, 1.0)
                for sz in (-1.0, 1.0)
            ],
            np.float32,
        )
        offset = self._convex_verts_len
        self._convex_verts.append(corners)
        self._convex_verts_len += corners.shape[0]
        dens = float(kw.get("density", 1.0))
        # Steiner: V = V_box + A*r + pi*L_edges/4 * r^2 + 4/3 pi r^3.
        vol = (
            8.0 * hx * hy * hz
            + 8.0 * (hx * hy + hy * hz + hz * hx) * r
            + 2.0 * _PI * (hx + hy + hz) * r * r
            + (4.0 / 3.0) * _PI * r**3
        )
        m = dens * vol
        ox, oy, oz = hx + r, hy + r, hz + r
        i3 = (
            np.asarray(
                [oy * oy + oz * oz, ox * ox + oz * oz, ox * ox + oy * oy],
                np.float32,
            )
            * (m / 3.0)
        )
        i6 = np.concatenate([i3, np.zeros(3, np.float32)]).astype(np.float32)
        return self.add_collider(
            body,
            ShapeType.CONVEX,
            (float(offset), 8.0, ox, oy, oz, 0.0, r),
            _mass_cache=(np.float32(m), i6, np.zeros(3, np.float32)),
            **kw,
        )

    def triangle(self, body, a, b, c, **kw):
        """A single (double-sided) triangle collider — a 3-vertex entry in
        the convex vertex pool (massless; meant for static geometry).

        Pool vertices are stored about the triangle centroid, which becomes
        the collider's local offset — keeping the collider-local AABB tight
        (a far-from-origin triangle would otherwise get a giant AABB and
        degrade the broadphase grid's cell size).
        """
        tri = np.asarray([a, b, c], np.float32)
        centroid = tri.mean(axis=0)
        tri = tri - centroid
        lp = np.asarray(kw.pop("local_pos", (0.0, 0.0, 0.0)), np.float32)
        offset = self._convex_verts_len
        self._convex_verts.append(tri)
        self._convex_verts_len += tri.shape[0]
        h = np.abs(tri).max(axis=0)
        return self.add_collider(
            body, ShapeType.CONVEX,
            # Lane 5 marks a FLAT collider: its face normal dominates the
            # contact normal (kills sideways MTVs at mesh-internal edges).
            (float(offset), 3.0, float(h[0]), float(h[1]), float(h[2]), 1.0),
            local_pos=tuple(lp + centroid),
            **kw,
        )

    def trimesh(self, body, vertices, faces, **kw):
        """Triangle-mesh collider (``Collider::trimesh``,
        ``parry/mod.rs:704-1170``): one pool-backed triangle collider per
        face, all attached to ``body``. TPU-native replacement for Parry's
        per-mesh BVH midphase — the uniform-grid broadphase already culls
        per-triangle AABBs, so triangles ARE the midphase. Intended for
        static geometry (triangles carry no mass).

        Returns the list of collider indices (one per face).
        """
        verts = np.asarray(vertices, np.float32).reshape(-1, 3)
        faces = np.asarray(faces, np.int64).reshape(-1, 3)
        return [
            self.triangle(
                body, verts[f[0]], verts[f[1]], verts[f[2]], **kw
            )
            for f in faces
        ]

    def convex_decomposition(self, body, vertices, faces, resolution=64,
                             max_parts=64, concavity=0.05,
                             plane_downsampling=4, min_voxels=4, **kw):
        """Approximate convex decomposition collider
        (``Collider::convex_decomposition``,
        ``parry/mod.rs:962-990``): decomposes the mesh into
        approximately-convex parts (native C++ VHACD-style kernel in
        ``avian_tpu.native``, numpy fallback) and attaches one convex-hull
        collider per part — the compound-of-hulls shape Parry builds.
        Unlike :meth:`trimesh`, the result is a *solid* suitable for
        dynamic bodies (hulls carry mass). Parameters mirror the
        reference's ``VhacdParameters`` (``parry/mod.rs:37-108``).

        Returns the list of collider indices (one per part).
        """
        from avian_tpu import native

        parts = native.decompose_mesh(
            vertices, faces, resolution=resolution, max_parts=max_parts,
            concavity=concavity, plane_downsampling=plane_downsampling,
            min_voxels=min_voxels,
        )
        if not parts:
            raise ValueError("convex_decomposition: empty voxelization")
        return [self.convex_hull(body, pts, **dict(kw)) for pts in parts]

    def heightfield(self, body, heights, x_extent, z_extent, **kw):
        """Heightfield collider (``Collider::heightfield``): a regular
        ``[nx, nz]`` grid of heights spanning ``x_extent`` x ``z_extent``
        centered on the body, triangulated into pool-backed triangles."""
        hf = np.asarray(heights, np.float32)
        nx, nz = hf.shape
        xs = np.linspace(-x_extent / 2.0, x_extent / 2.0, nx)
        zs = np.linspace(-z_extent / 2.0, z_extent / 2.0, nz)
        verts = np.stack(
            [
                np.repeat(xs, nz),
                hf.reshape(-1),
                np.tile(zs, nx),
            ],
            axis=-1,
        ).astype(np.float32)

        def vid(i, k):
            return i * nz + k

        faces = []
        for i in range(nx - 1):
            for k in range(nz - 1):
                faces.append((vid(i, k), vid(i + 1, k), vid(i, k + 1)))
                faces.append((vid(i + 1, k), vid(i + 1, k + 1), vid(i, k + 1)))
        return self.trimesh(body, verts, faces, **kw)

    def voxels(self, body, occupancy, voxel_size=1.0, origin=(0.0, 0.0, 0.0),
               **kw):
        """Voxel collider (``Collider::voxels``): one cube collider per
        *surface* voxel of a boolean occupancy grid (interior voxels are
        unreachable and skipped). ``origin`` is the grid's corner in the
        body frame. Returns the collider indices."""
        occ = np.asarray(occupancy, bool)
        if occ.ndim != 3:
            raise ValueError("occupancy must be [nx, ny, nz] booleans")
        h = voxel_size / 2.0
        filled = np.pad(occ, 1, constant_values=False)
        interior = (
            filled[:-2, 1:-1, 1:-1] & filled[2:, 1:-1, 1:-1]
            & filled[1:-1, :-2, 1:-1] & filled[1:-1, 2:, 1:-1]
            & filled[1:-1, 1:-1, :-2] & filled[1:-1, 1:-1, 2:]
        )
        surface = occ & ~interior
        out = []
        org = np.asarray(origin, np.float32)
        lp0 = np.asarray(kw.pop("local_pos", (0.0, 0.0, 0.0)), np.float32)
        for ix, iy, iz in zip(*np.nonzero(surface)):
            c = org + (np.asarray([ix, iy, iz], np.float32) + 0.5) * voxel_size
            out.append(
                self.box(body, h, h, h, local_pos=tuple(lp0 + c), **kw)
            )
        return out

    def convex_hull(self, body, points, **kw):
        """Convex hull collider from a point cloud
        (``Collider::convex_hull``, ``parry/mod.rs:704-1170``). The hull is
        computed host-side (scipy qhull); at most ``MAX_HULL_VERTS``
        vertices are kept (farthest-point simplification beyond that).
        """
        from avian_tpu.geometry.convex import MAX_HULL_VERTS

        pts = np.asarray(points, np.float32).reshape(-1, 3)
        if pts.shape[0] < 4:
            raise ValueError("convex_hull needs >= 4 non-coplanar points")
        from scipy.spatial import ConvexHull

        hull = ConvexHull(pts)
        verts = pts[hull.vertices]
        if verts.shape[0] > MAX_HULL_VERTS:
            # Farthest-point simplification: greedy max-min selection.
            keep = [int(np.argmax(np.linalg.norm(verts - verts.mean(0), axis=1)))]
            d = np.linalg.norm(verts - verts[keep[0]], axis=1)
            for _ in range(MAX_HULL_VERTS - 1):
                nxt = int(np.argmax(d))
                keep.append(nxt)
                d = np.minimum(d, np.linalg.norm(verts - verts[nxt], axis=1))
            verts = verts[np.asarray(keep)]
        # Store pool verts about the hull centroid (tight local AABB); the
        # centroid becomes the collider's local offset, and the cached
        # points shift with it so mass properties come out in the collider
        # frame.
        centroid = verts.mean(axis=0)
        verts = verts - centroid
        lp = np.asarray(kw.pop("local_pos", (0.0, 0.0, 0.0)), np.float32)
        offset = self._convex_verts_len
        self._convex_verts.append(verts)
        self._convex_verts_len += verts.shape[0]
        h = np.abs(verts).max(axis=0)
        return self.add_collider(
            body, ShapeType.CONVEX,
            (float(offset), float(verts.shape[0]), float(h[0]), float(h[1]),
             float(h[2])),
            local_pos=tuple(lp + centroid),
            _hull_cache=(pts - centroid, hull), **kw,
        )

    def custom_collider(
        self, body, shape=None, params=(), mass=None, inertia=None,
        com=(0.0, 0.0, 0.0), index=None, **kw,
    ):
        """Attach a user-shape collider (see ``avian_tpu.CustomShape``).

        Pass the ``CustomShape`` instance as ``shape`` (registered by
        identity; ``finalize`` stores the tuple on ``World.custom_shapes``
        so ``physics_step`` and queries pick it up automatically), or a
        raw ``index`` into a ``custom_shapes=`` tuple you pass to
        ``physics_step`` yourself. The stored runtime code is
        ``CUSTOM_SHAPE_BASE + index``. The engine cannot derive mass
        properties from a support function, so ``mass`` and ``inertia``
        (diag-3 or sym-6 about the shape's COM) are required — the
        reference's ``custom_collider.rs`` likewise spawns an explicit
        ``MassPropertiesBundle`` next to its custom collider.
        """
        from avian_tpu.api.custom_shapes import CUSTOM_SHAPE_BASE

        if (shape is None) == (index is None):
            raise ValueError(
                "pass exactly one of shape= (a CustomShape) or index="
            )
        if shape is not None:
            for i, s in enumerate(self._custom_shapes):
                if s is shape:
                    index = i
                    break
            else:
                self._custom_shapes.append(shape)
                index = len(self._custom_shapes) - 1
        if mass is None or inertia is None:
            raise ValueError(
                "custom_collider requires explicit mass= and inertia= "
                "(the engine cannot integrate a support function)"
            )
        i = np.asarray(inertia, np.float32).reshape(-1)
        if i.shape[0] == 3:
            i6 = np.concatenate([i, np.zeros(3, np.float32)])
        elif i.shape[0] == 6:
            i6 = i
        else:
            raise ValueError("inertia must be diag-3 or sym-6")
        kw["_mass_cache"] = (
            np.float32(mass), i6, np.asarray(com, np.float32)
        )
        return self.add_collider(
            body, CUSTOM_SHAPE_BASE + int(index), params, **kw
        )

    # ------------------------------------------------------------------
    def add_joint(
        self,
        jtype: JointType,
        body_a: int,
        body_b: int,
        anchor_a=(0.0, 0.0, 0.0),
        anchor_b=(0.0, 0.0, 0.0),
        basis_a=(0.0, 0.0, 0.0, 1.0),
        basis_b=(0.0, 0.0, 0.0, 1.0),
        compliance=(0.0, 0.0, 0.0, 0.0),
        limit_min: float = 0.0,
        limit_max: float = 0.0,
        limit_enabled: bool = False,
        twist_min: float = 0.0,
        twist_max: float = 0.0,
        twist_enabled: bool = False,
        lin_damping: float = 0.0,
        ang_damping: float = 0.0,
        collision_disabled: bool = True,
    ) -> int:
        self._joints.append(
            dict(
                jtype=int(jtype),
                body_a=body_a,
                body_b=body_b,
                anchor_a=np.asarray(anchor_a, np.float32),
                anchor_b=np.asarray(anchor_b, np.float32),
                basis_a=_quat_np(basis_a),
                basis_b=_quat_np(basis_b),
                compliance=np.asarray(compliance, np.float32),
                limit_min=limit_min,
                twist_min=twist_min,
                twist_max=twist_max,
                twist_enabled=twist_enabled,
                limit_max=limit_max,
                limit_enabled=limit_enabled,
                lin_damping=lin_damping,
                ang_damping=ang_damping,
                collision_disabled=collision_disabled,
            )
        )
        return len(self._joints) - 1

    def revolute_joint(self, body_a, body_b, axis=(0.0, 0.0, 1.0), **kw):
        """Hinge about ``axis`` (expressed in both local frames via basis).

        The hinge axis is the basis frames' local Z rotated into each body.
        With identity bases the axis must be given here and is encoded as a
        basis rotating Z onto it.
        """
        basis = _quat_from_z_to(np.asarray(axis, np.float32))
        kw.setdefault("basis_a", basis)
        kw.setdefault("basis_b", basis)
        return self.add_joint(JointType.REVOLUTE, body_a, body_b, **kw)

    def shape_pairs(self):
        """Canonical (type_a, type_b) combinations this scene can produce —
        pass to ``PhysicsConfig(shape_pairs=...)`` so the narrowphase only
        lowers reachable pair functions."""
        present = sorted({cd["shape"] for cd in self._colliders})
        return tuple(
            (a, b) for i, a in enumerate(present) for b in present[i:]
        )

    # ------------------------------------------------------------------
    def finalize(
        self,
        max_bodies: int | None = None,
        max_colliders: int | None = None,
        max_contacts: int | None = None,
        max_joints: int | None = None,
    ) -> World:
        nb = len(self._bodies)
        nc = len(self._colliders)
        nj = len(self._joints)
        n = max_bodies or max(nb, 1)
        m = max_colliders or max(nc, 1)
        c = max_contacts or max(8 * m, 64)
        j = max_joints if max_joints is not None else nj
        assert nb <= n and nc <= m and nj <= j
        # Above KEY_M_MAX colliders the engine switches to lexicographic
        # pair matching (pipeline/contacts.py); slot math stays i32.
        assert m <= 2_000_000, "collider capacity sanity bound"
        assert n <= 46340, (
            "body-pair keys use i32 = a * N + b (joint-disabled probe)"
        )

        world = World.zeros(n, m, c, j)

        # ---- colliders -------------------------------------------------
        col = {k: [] for k in (
            "shape_type", "params", "body_idx", "local_pos", "local_quat",
            "friction", "static_friction", "restitution", "friction_combine",
            "restitution_combine", "density", "layer_members", "layer_filter",
            "is_sensor", "collision_margin", "speculative_margin")}
        for cd in self._colliders:
            col["shape_type"].append(cd["shape"])
            col["params"].append(cd["params"])
            col["body_idx"].append(cd["body"])
            col["local_pos"].append(cd["local_pos"])
            col["local_quat"].append(cd["local_quat"])
            for k in ("friction", "static_friction", "restitution",
                      "friction_combine", "restitution_combine", "density",
                      "layer_members", "layer_filter", "is_sensor",
                      "collision_margin", "speculative_margin"):
                col[k].append(cd[k])

        def _pad(arr, total, fill=0.0):
            a = np.asarray(arr)
            pad_shape = (total - a.shape[0],) + a.shape[1:]
            return np.concatenate([a, np.full(pad_shape, fill, a.dtype)], 0)

        if nc:
            colliders = world.colliders.replace(
                shape_type=jnp.asarray(_pad(np.asarray(col["shape_type"], np.int32), m)),
                params=jnp.asarray(_pad(np.asarray(col["params"], np.float32), m)),
                body_idx=jnp.asarray(_pad(np.asarray(col["body_idx"], np.int32), m)),
                local_pos=jnp.asarray(_pad(np.asarray(col["local_pos"], np.float32), m)),
                local_quat=jnp.asarray(_pad(np.asarray(col["local_quat"], np.float32), m)),
                friction=jnp.asarray(_pad(np.asarray(col["friction"], np.float32), m)),
                static_friction=jnp.asarray(_pad(np.asarray(col["static_friction"], np.float32), m)),
                restitution=jnp.asarray(_pad(np.asarray(col["restitution"], np.float32), m)),
                friction_combine=jnp.asarray(_pad(np.asarray(col["friction_combine"], np.int32), m)),
                restitution_combine=jnp.asarray(_pad(np.asarray(col["restitution_combine"], np.int32), m)),
                density=jnp.asarray(_pad(np.asarray(col["density"], np.float32), m, 1.0)),
                layer_members=jnp.asarray(_pad(np.asarray(col["layer_members"], np.uint32), m)),
                layer_filter=jnp.asarray(_pad(np.asarray(col["layer_filter"], np.uint32), m)),
                is_sensor=jnp.asarray(_pad(np.asarray(col["is_sensor"], bool), m, False)),
                active=jnp.asarray(np.arange(m) < nc),
                collision_margin=jnp.asarray(_pad(np.asarray(col["collision_margin"], np.float32), m)),
                speculative_margin=jnp.asarray(_pad(np.asarray(col["speculative_margin"], np.float32), m, _INF)),
            )
        else:
            colliders = world.colliders

        # ---- bodies ----------------------------------------------------
        # Auto mass properties: accumulate collider contributions per body
        # (vectorized numpy — a Python/jnp per-collider loop here costs
        # minutes at 10k+ colliders).
        auto_mass = np.zeros(n, np.float32)
        auto_first_moment = np.zeros((n, 3), np.float32)  # sum m_i * com_i
        auto_inertia = np.zeros((n, 6), np.float32)  # about body origin
        if nc:
            st = np.asarray(col["shape_type"], np.int32)
            pr = np.asarray(col["params"], np.float32)
            dens = np.asarray(col["density"], np.float32)
            cm, ci6, ccom = _mass_properties_np(st, pr, dens)
            # Convex hulls: exact tetra-decomposition properties.
            for ci, cd in enumerate(self._colliders):
                if cd.get("hull_cache") is not None:
                    pts_h, hull_h = cd["hull_cache"]
                    cm[ci], ci6[ci], ccom[ci] = _hull_mass_props_np(
                        pts_h, hull_h, cd["density"]
                    )
                if cd.get("mass_cache") is not None:
                    cm[ci], ci6[ci], ccom[ci] = cd["mass_cache"]
            lp = np.asarray(col["local_pos"], np.float32).reshape(nc, 3)
            # Shape COM in body frame (identity local_quat assumed for the
            # axis-aligned primitive inertias; hull inertia is about its
            # own COM already).
            shape_com = lp + ccom
            # Parallel-axis shift of every collider inertia at once.
            i6 = _shift_inertia_np(ci6, cm, shape_com)
            body_of = np.asarray(col["body_idx"], np.int64)
            np.add.at(auto_mass, body_of, cm)
            np.add.at(auto_first_moment, body_of, cm[:, None] * shape_com)
            np.add.at(auto_inertia, body_of, i6)

        arr = {k: [] for k in (
            "pos", "quat", "lin_vel", "ang_vel", "inv_mass", "inv_inertia",
            "com", "gravity_scale", "lin_damping", "ang_damping",
            "max_lin_speed", "max_ang_speed", "dominance", "body_type",
            "locked_axes", "gyroscopic", "swept_ccd", "swept_ccd_nonlinear",
            "sleep_disabled")}
        masses = np.zeros(nb, np.float32)
        coms = np.zeros((nb, 3), np.float32)
        i6s = np.zeros((nb, 6), np.float32)
        dyn = np.zeros(nb, bool)
        explicit_i = np.zeros(nb, bool)
        for i, bd in enumerate(self._bodies):
            arr["pos"].append(bd["pos"])
            arr["quat"].append(bd["quat"])
            arr["lin_vel"].append(bd["lin_vel"])
            arr["ang_vel"].append(bd["ang_vel"])
            dyn[i] = bd["body_type"] == BodyType.DYNAMIC
            masses[i] = bd["mass"] if bd["mass"] is not None else auto_mass[i]
            if bd["com"] is not None:
                coms[i] = np.asarray(bd["com"], np.float32)
            elif auto_mass[i] > 0:
                coms[i] = auto_first_moment[i] / auto_mass[i]
            if bd["inertia"] is not None:
                it = np.asarray(bd["inertia"], np.float32)
                i6s[i] = (
                    np.concatenate([it, np.zeros(3, np.float32)])
                    if it.shape == (3,)
                    else it
                )
                explicit_i[i] = True
            for k in ("gravity_scale", "lin_damping", "ang_damping",
                      "max_lin_speed", "max_ang_speed", "dominance",
                      "body_type", "locked_axes", "gyroscopic", "swept_ccd",
                      "swept_ccd_nonlinear",
                      "sleep_disabled"):
                arr[k].append(bd[k])

        # Vectorized: shift auto inertia from body origin to COM, invert.
        shifted = _shift_inertia_np(auto_inertia[:nb], -auto_mass[:nb], coms)
        i6s = np.where(explicit_i[:, None], i6s, shifted)
        invertible = dyn & (masses > 0)
        inv_mass = np.where(invertible, 1.0 / np.maximum(masses, 1e-30), 0.0)
        inv_i6 = _sym3_inverse_np(i6s.astype(np.float32))
        inv_i6 = np.where(invertible[:, None], inv_i6, 0.0).astype(np.float32)
        arr["inv_mass"] = list(inv_mass.astype(np.float32))
        arr["inv_inertia"] = list(inv_i6)
        arr["com"] = list(coms)

        if nb:
            bodies = world.bodies.replace(
                pos=jnp.asarray(_pad(np.asarray(arr["pos"], np.float32), n)),
                quat=jnp.asarray(_pad(np.asarray(arr["quat"], np.float32), n)).at[nb:, 3].set(1.0),
                lin_vel=jnp.asarray(_pad(np.asarray(arr["lin_vel"], np.float32), n)),
                ang_vel=jnp.asarray(_pad(np.asarray(arr["ang_vel"], np.float32), n)),
                inv_mass=jnp.asarray(_pad(np.asarray(arr["inv_mass"], np.float32), n)),
                inv_inertia=jnp.asarray(_pad(np.asarray(arr["inv_inertia"], np.float32), n)),
                com=jnp.asarray(_pad(np.asarray(arr["com"], np.float32), n)),
                gravity_scale=jnp.asarray(_pad(np.asarray(arr["gravity_scale"], np.float32), n, 1.0)),
                lin_damping=jnp.asarray(_pad(np.asarray(arr["lin_damping"], np.float32), n)),
                ang_damping=jnp.asarray(_pad(np.asarray(arr["ang_damping"], np.float32), n)),
                max_lin_speed=jnp.asarray(_pad(np.asarray(arr["max_lin_speed"], np.float32), n, _INF)),
                max_ang_speed=jnp.asarray(_pad(np.asarray(arr["max_ang_speed"], np.float32), n, _INF)),
                dominance=jnp.asarray(_pad(np.asarray(arr["dominance"], np.int32), n)),
                body_type=jnp.asarray(_pad(np.asarray(arr["body_type"], np.int32), n)),
                active=jnp.asarray(np.arange(n) < nb),
                locked_axes=jnp.asarray(_pad(np.asarray(arr["locked_axes"], np.int32), n)),
                gyroscopic=jnp.asarray(_pad(np.asarray(arr["gyroscopic"], bool), n, False)),
                swept_ccd=jnp.asarray(_pad(np.asarray(arr["swept_ccd"], bool), n, False)),
                swept_ccd_nonlinear=jnp.asarray(_pad(np.asarray(arr["swept_ccd_nonlinear"], bool), n, False)),
                sleep_disabled=jnp.asarray(_pad(np.asarray(arr["sleep_disabled"], bool), n, False)),
            )
        else:
            bodies = world.bodies

        # ---- joints ----------------------------------------------------
        joints = world.joints
        if nj:
            joints = joints.replace(
                jtype=jnp.asarray(_pad(np.asarray([jd["jtype"] for jd in self._joints], np.int32), j)),
                body_a=jnp.asarray(_pad(np.asarray([jd["body_a"] for jd in self._joints], np.int32), j)),
                body_b=jnp.asarray(_pad(np.asarray([jd["body_b"] for jd in self._joints], np.int32), j)),
                active=jnp.asarray(np.arange(j) < nj),
                frame_pos_a=jnp.asarray(_pad(np.asarray([jd["anchor_a"] for jd in self._joints], np.float32), j)),
                frame_pos_b=jnp.asarray(_pad(np.asarray([jd["anchor_b"] for jd in self._joints], np.float32), j)),
                frame_quat_a=jnp.asarray(_pad(np.asarray([jd["basis_a"] for jd in self._joints], np.float32), j)).at[nj:, 3].set(1.0),
                frame_quat_b=jnp.asarray(_pad(np.asarray([jd["basis_b"] for jd in self._joints], np.float32), j)).at[nj:, 3].set(1.0),
                compliance=jnp.asarray(_pad(np.asarray([jd["compliance"] for jd in self._joints], np.float32), j)),
                limit_min=jnp.asarray(_pad(np.asarray([jd["limit_min"] for jd in self._joints], np.float32), j)),
                limit_max=jnp.asarray(_pad(np.asarray([jd["limit_max"] for jd in self._joints], np.float32), j)),
                limit_enabled=jnp.asarray(_pad(np.asarray([jd["limit_enabled"] for jd in self._joints], bool), j, False)),
                twist_min=jnp.asarray(_pad(np.asarray([jd["twist_min"] for jd in self._joints], np.float32), j)),
                twist_max=jnp.asarray(_pad(np.asarray([jd["twist_max"] for jd in self._joints], np.float32), j)),
                twist_enabled=jnp.asarray(_pad(np.asarray([jd["twist_enabled"] for jd in self._joints], bool), j, False)),
                lin_damping=jnp.asarray(_pad(np.asarray([jd["lin_damping"] for jd in self._joints], np.float32), j)),
                ang_damping=jnp.asarray(_pad(np.asarray([jd["ang_damping"] for jd in self._joints], np.float32), j)),
                collision_disabled=jnp.asarray(_pad(np.asarray([jd["collision_disabled"] for jd in self._joints], bool), j, False)),
            )

        if self._convex_verts:
            from avian_tpu.geometry.convex import MAX_HULL_VERTS

            pool = np.concatenate(
                self._convex_verts
                + [np.zeros((MAX_HULL_VERTS, 3), np.float32)],
                axis=0,
            )
        else:
            pool = np.zeros((1, 3), np.float32)

        return world.replace(
            bodies=bodies,
            colliders=colliders,
            joints=joints,
            gravity=jnp.asarray(self.gravity, jnp.float32),
            convex_verts=jnp.asarray(pool),
            # Static metadata: only these narrowphase branches get lowered.
            shape_pairs=self.shape_pairs(),
            custom_shapes=tuple(self._custom_shapes),
        )


def _quat_from_z_to(axis):
    """Quaternion rotating local +Z onto ``axis`` (numpy, host-side)."""
    axis = axis / max(float(np.linalg.norm(axis)), 1e-12)
    z = np.array([0.0, 0.0, 1.0], np.float32)
    c = float(np.dot(z, axis))
    if c > 1.0 - 1e-8:
        return np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    if c < -1.0 + 1e-8:
        return np.array([1.0, 0.0, 0.0, 0.0], np.float32)  # 180 deg about X
    v = np.cross(z, axis)
    s = _math.sqrt((1.0 + c) * 2.0)
    return np.array([v[0] / s, v[1] / s, v[2] / s, s / 2.0], np.float32)
