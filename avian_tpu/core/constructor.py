"""Data-driven collider construction recipes.

Counterpart of the reference's ``ColliderConstructor`` enum — the shape
recipe apps attach to entities/scenes instead of calling shape
constructors directly (``src/collision/collider/constructor.rs:312``) —
and its mesh-derived colliders (``collider-from-mesh``,
``trimesh_builder.rs``).

A recipe is a plain dict (JSON-friendly): ``{"kind": ..., **params}``.
``spawn`` applies one recipe to a body; ``spawn_hierarchy`` applies a list
of (recipe, local_pos, local_quat) entries — the analogue of
``ColliderConstructorHierarchy`` attaching colliders across a scene
hierarchy, flattened to per-collider local offsets.

Supported kinds:

- ``sphere``       radius
- ``box``          half_x, half_y, half_z   (``cuboid`` takes full extents)
- ``capsule``      radius, length           (cylindrical part length)
- ``cylinder``     radius, height
- ``cone``         radius, height
- ``half_space``   normal
- ``convex_hull``  points [K, 3]
- ``trimesh``      vertices [V, 3], faces [F, 3]
- ``heightfield``  heights [nx, nz], x_extent, z_extent
- ``convex_decomposition``  vertices [V, 3], faces [F, 3] + optional
  VHACD params (resolution, max_parts, concavity, plane_downsampling,
  min_voxels) — compound of approximately-convex hulls via the native
  decomposition kernel (``avian_tpu.native``).
- ``trimesh_from_mesh`` / ``convex_hull_from_mesh`` /
  ``convex_decomposition_from_mesh``: mesh dict with "vertices"/"faces"
  (the collider-from-mesh path).
"""

from avian_tpu.core.builder import SceneBuilder


def spawn(builder: SceneBuilder, body: int, recipe: dict, **collider_kw):
    """Apply one recipe; returns the collider index (or list for meshes)."""
    r = dict(recipe)
    kind = r.pop("kind")
    if kind == "sphere":
        return builder.sphere(body, r["radius"], **collider_kw)
    if kind == "box":
        return builder.box(
            body, r["half_x"], r["half_y"], r["half_z"], **collider_kw
        )
    if kind == "cuboid":
        return builder.cuboid(
            body, r["x_length"], r["y_length"], r["z_length"], **collider_kw
        )
    if kind == "capsule":
        return builder.capsule(body, r["radius"], r["length"], **collider_kw)
    if kind == "cylinder":
        return builder.cylinder(body, r["radius"], r["height"], **collider_kw)
    if kind == "cone":
        return builder.cone(body, r["radius"], r["height"], **collider_kw)
    if kind == "half_space":
        return builder.half_space(body, normal=r["normal"], **collider_kw)
    if kind == "convex_hull":
        return builder.convex_hull(body, r["points"], **collider_kw)
    if kind == "trimesh":
        return builder.trimesh(
            body, r["vertices"], r["faces"], **collider_kw
        )
    if kind == "heightfield":
        return builder.heightfield(
            body, r["heights"], r["x_extent"], r["z_extent"], **collider_kw
        )
    if kind == "convex_decomposition":
        verts = r.pop("vertices")
        faces = r.pop("faces")
        return builder.convex_decomposition(
            body, verts, faces, **r, **collider_kw
        )
    if kind == "convex_decomposition_from_mesh":
        mesh = r.pop("mesh")
        return builder.convex_decomposition(
            body, mesh["vertices"], mesh["faces"], **r, **collider_kw
        )
    if kind == "trimesh_from_mesh":
        mesh = r["mesh"]
        return builder.trimesh(
            body, mesh["vertices"], mesh["faces"], **collider_kw
        )
    if kind == "convex_hull_from_mesh":
        mesh = r["mesh"]
        return builder.convex_hull(body, mesh["vertices"], **collider_kw)
    raise ValueError(
        f"unknown collider recipe kind {kind!r} (see "
        f"avian_tpu.core.constructor docstring for supported kinds)"
    )


def spawn_hierarchy(builder: SceneBuilder, body: int, entries):
    """Apply a list of recipe entries to one body.

    Each entry is ``(recipe, local_pos, local_quat)`` or just ``recipe``
    — the flattened analogue of ``ColliderConstructorHierarchy``.
    Returns the list of collider indices.
    """
    out = []
    for entry in entries:
        if isinstance(entry, dict):
            recipe, local_pos, local_quat = entry, (0, 0, 0), (0, 0, 0, 1)
        else:
            recipe, local_pos, local_quat = entry
        got = spawn(
            builder, body, recipe,
            local_pos=local_pos, local_quat=local_quat,
        )
        out.extend(got if isinstance(got, list) else [got])
    return out
