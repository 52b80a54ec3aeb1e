"""User-defined collider shapes — the TPU-native counterpart of the
reference's ``AnyCollider`` trait plus the ``ColliderBackendPlugin<C>`` /
``NarrowPhasePlugin<C>`` registration pair (reference
``crates/avian2d/examples/custom_collider.rs``,
``src/collision/collider/backend.rs``, ``src/collision/collider/mod.rs``).

Where the reference asks a custom collider for AABBs
(``AnyCollider::aabb_with_context``) and contact manifolds
(``contact_manifolds_with_context``), the TPU-native contract is smaller
and compiles into the SAME fused narrowphase dispatch as the built-in
shapes: a custom collider is its **support function**. The engine's
generic support-map pipeline (Frank-Wolfe distance + subgradient MTV +
support-patch clipping, ``geometry/convex.py``) then produces manifolds
against every built-in shape and every other custom shape with no
additional user code.

A :class:`CustomShape` provides, all in the collider's LOCAL frame and
operating on the 7-lane ``params`` row the builder stores:

- ``support(prm, d) -> [3]``: farthest point of the shape along
  direction ``d`` (need not be normalized). Must be trace-safe JAX.
- ``aabb_half_extents(prm) -> [3]``: a conservative local bounding box;
  the broadphase rotates it with ``|R| @ h``.
- ``patch(prm, d) -> (pts [8,3], normal [3], count i32)`` *(optional)*:
  the contact patch (face/edge/point ring) most anti-parallel to ``d``.
  Omitted ⇒ a single support point (correct for smooth shapes like
  ellipsoids; flat-faced shapes should provide one for stable stacking).

Registration: pass the shape instance to
``SceneBuilder.custom_collider(body, shape=my_shape, ...)`` — ``finalize``
stores the tuple as ``World.custom_shapes`` static metadata (like
``shape_pairs``) and ``physics_step`` + every spatial query pick it up
automatically. The shape's runtime type code is ``CUSTOM_SHAPE_BASE +
index`` into that tuple. An explicit ``physics_step(world, config,
custom_shapes=(...,))`` argument overrides the world's tuple (pair it
with ``custom_collider(body, index=i, ...)``)::

    shape = CustomShape("ellipsoid", support=..., aabb_half_extents=...)
    b.custom_collider(body, shape=shape, params=(a, b_, c), mass=m,
                      inertia=(ix, iy, iz))
    world = b.finalize(...)
    world = physics_step(world, config)   # shape travels with the world

Scope: contacts, solver, sleeping, islands, events, hooks, speculative
CCD, and spatial queries (cast_ray / ray_hits / grid raycasts /
project_point / point_intersections / cast_shape / shape_intersections)
all see custom shapes. Swept (opt-in) CCD does not.

NOTE: ``CustomShape`` hashes by identity (it is a jit static argument) —
build it once and reuse the same instance every step, or every call
re-traces.
"""

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp

# Runtime shape-type codes for custom shapes start here (above every
# built-in ``ShapeType`` tag); code = CUSTOM_SHAPE_BASE + tuple index.
CUSTOM_SHAPE_BASE = 16


def point_patch(support):
    """Default contact patch: the single support point (smooth shapes)."""
    from avian_tpu.geometry import convex as _cx

    def patch(prm, d):
        dn = _cx._nrm(d)
        pts = jnp.broadcast_to(support(prm, dn), (_cx._PATCH, 3))
        return pts, dn, jnp.asarray(1, jnp.int32)

    return patch


@dataclass(frozen=True, eq=False)  # eq=False -> identity hash (jit static)
class CustomShape:
    name: str
    support: Callable
    aabb_half_extents: Callable
    patch: Optional[Callable] = None

    def patch_fn(self):
        return self.patch if self.patch is not None else point_patch(
            self.support
        )
