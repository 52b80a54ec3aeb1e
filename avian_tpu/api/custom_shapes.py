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

Registration is one static argument: ``physics_step(world, config,
custom_shapes=(my_shape,))``. The shape's runtime type code is
``CUSTOM_SHAPE_BASE + index`` into that tuple, which is also what
``SceneBuilder.custom_collider`` stores. Spawn with::

    shape = CustomShape("ellipsoid", support=..., aabb_half_extents=...)
    b.custom_collider(body, index=0, params=(a, b_, c), mass=m,
                      inertia=(ix, iy, iz))
    ...
    world = physics_step(world, config, custom_shapes=(shape,))

Scope (mirrors the reference example, which implements collision
detection only): contacts, solver, sleeping, islands, events and hooks
all work; spatial queries and swept CCD do not see custom shapes
(speculative CCD — the default — does, since it lives in the
narrowphase).

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
