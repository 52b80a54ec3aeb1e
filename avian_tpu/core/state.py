"""The world state: a pytree of fixed-capacity SoA arrays.

This is the TPU-native counterpart of the reference's ECS storage: every
component listed in SURVEY.md §2 (``RigidBody``, velocities, mass components,
``Collider``, materials, layers, joints, the persistent ``ContactGraph``) maps
to a column here. Columnar fixed-capacity layout keeps every shape static
under ``jax.jit`` and lets the whole step fuse into large vectorized kernels.

Capacity conventions:
- ``Bodies``:    N slots, padded; ``active`` masks real bodies.
- ``Colliders``: M slots; a collider points at its body via ``body_idx``
  (the ``ColliderOf`` relationship, reference
  ``src/collision/collider_hierarchy/mod.rs:53``). Multiple colliders per
  body = compound shapes.
- ``Contacts``:  C pair slots with up to 4 manifold points each (the
  persistent contact graph, reference
  ``src/collision/contact_types/contact_graph.rs:76``). Warm-start impulses
  live here and persist across steps.
- ``Joints``:    J slots (``src/dynamics/joints/``).

Index 0..N-1 are valid body slots; padded/invalid references use index 0 with
an ``active=False`` mask (never -1, so gathers stay in bounds).
"""

from dataclasses import dataclass, fields, replace

import jax
import jax.numpy as jnp
import numpy as np

from avian_tpu.math import quat as quat_m

_INF = float("inf")


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass(frozen=True)
class Bodies:
    """Rigid-body SoA columns (reference ``src/dynamics/rigid_body/mod.rs``).

    Rotations are quaternions (x, y, z, w); inertia is the *local-frame*
    inverse tensor as a symmetric-6 array; ``com`` is the local-frame center
    of mass. World-frame inverse inertia is recomputed from the rotation when
    needed (the reference caches it in ``GlobalAngularInertia``).
    """

    # Kinematic state
    pos: jnp.ndarray          # f32[N, 3] — center-of-mass-relative? No: body origin
    quat: jnp.ndarray         # f32[N, 4]
    lin_vel: jnp.ndarray      # f32[N, 3]
    ang_vel: jnp.ndarray      # f32[N, 3]
    # Mass properties (computed, ComputedMass/ComputedAngularInertia/COM)
    inv_mass: jnp.ndarray     # f32[N]
    inv_inertia: jnp.ndarray  # f32[N, 6] local-frame inverse inertia (sym3)
    com: jnp.ndarray          # f32[N, 3] local center of mass
    # Per-body scalars
    gravity_scale: jnp.ndarray   # f32[N]
    lin_damping: jnp.ndarray     # f32[N]
    ang_damping: jnp.ndarray     # f32[N]
    max_lin_speed: jnp.ndarray   # f32[N] (inf = unclamped)
    max_ang_speed: jnp.ndarray   # f32[N]
    dominance: jnp.ndarray       # i32[N] (-127..127; higher pushes lower)
    # Flags
    body_type: jnp.ndarray    # i32[N] BodyType
    active: jnp.ndarray       # bool[N] slot in use and enabled
    locked_axes: jnp.ndarray  # i32[N] bit mask (types.LOCK_*)
    gyroscopic: jnp.ndarray   # bool[N] apply gyroscopic torque (3D)
    swept_ccd: jnp.ndarray    # bool[N] swept CCD (SweptCcd component)
    # SweepMode::NonLinear (``ccd/mod.rs:479-498``): include rotation in
    # the conservative-advancement sweep.
    swept_ccd_nonlinear: jnp.ndarray  # bool[N]
    # Per-step force/torque accumulators (Forces API), cleared by the step.
    force: jnp.ndarray        # f32[N, 3] world-frame force
    torque: jnp.ndarray       # f32[N, 3]
    # Constant (persistent) actuation, world frame.
    const_force: jnp.ndarray     # f32[N, 3]
    const_torque: jnp.ndarray    # f32[N, 3]
    const_lin_acc: jnp.ndarray   # f32[N, 3]
    const_ang_acc: jnp.ndarray   # f32[N, 3]
    # Constant actuation in the body's local frame (rotates with the body).
    const_local_force: jnp.ndarray    # f32[N, 3]
    const_local_torque: jnp.ndarray   # f32[N, 3]
    const_local_lin_acc: jnp.ndarray  # f32[N, 3]
    const_local_ang_acc: jnp.ndarray  # f32[N, 3]
    # Sleeping (islands/sleeping.rs)
    sleeping: jnp.ndarray      # bool[N]
    sleep_timer: jnp.ndarray   # f32[N]
    sleep_disabled: jnp.ndarray  # bool[N] (SleepingDisabled)
    island: jnp.ndarray        # i32[N] island label (computed each step)
    # Pose snapshot taken by ``update_sleeping`` at the end of every step.
    # A *sleeping* body is never integrated, so if its live pose differs
    # from this snapshot at the next step's end, the user teleported it by
    # writing ``bodies.pos``/``quat`` directly — the array-world analogue
    # of the reference's change-detection wake (``islands/sleeping.rs:558``).
    sleep_pos: jnp.ndarray     # f32[N, 3]
    sleep_quat: jnp.ndarray    # f32[N, 4]

    @property
    def capacity(self) -> int:
        return self.pos.shape[-2]

    def replace(self, **kw):
        return replace(self, **kw)

    @staticmethod
    def zeros(n: int) -> "Bodies":
        f3 = jnp.zeros((n, 3), jnp.float32)
        f1 = jnp.zeros((n,), jnp.float32)
        return Bodies(
            pos=f3,
            quat=quat_m.identity((n,)),
            lin_vel=f3,
            ang_vel=f3,
            inv_mass=f1,
            inv_inertia=jnp.zeros((n, 6), jnp.float32),
            com=f3,
            gravity_scale=jnp.ones((n,), jnp.float32),
            lin_damping=f1,
            ang_damping=f1,
            max_lin_speed=jnp.full((n,), _INF, jnp.float32),
            max_ang_speed=jnp.full((n,), _INF, jnp.float32),
            dominance=jnp.zeros((n,), jnp.int32),
            body_type=jnp.zeros((n,), jnp.int32),
            active=jnp.zeros((n,), bool),
            locked_axes=jnp.zeros((n,), jnp.int32),
            gyroscopic=jnp.zeros((n,), bool),
            swept_ccd=jnp.zeros((n,), bool),
            swept_ccd_nonlinear=jnp.zeros((n,), bool),
            force=f3,
            torque=f3,
            const_force=f3,
            const_torque=f3,
            const_lin_acc=f3,
            const_ang_acc=f3,
            const_local_force=f3,
            const_local_torque=f3,
            const_local_lin_acc=f3,
            const_local_ang_acc=f3,
            sleeping=jnp.zeros((n,), bool),
            sleep_timer=f1,
            sleep_disabled=jnp.zeros((n,), bool),
            island=jnp.zeros((n,), jnp.int32),
            sleep_pos=f3,
            sleep_quat=quat_m.identity((n,)),
        )


@_register
@dataclass(frozen=True)
class Colliders:
    """Collider SoA columns (reference ``src/collision/collider/``)."""

    shape_type: jnp.ndarray   # i32[M] ShapeType
    params: jnp.ndarray       # f32[M, 8] shape params (see ShapeType docs)
    body_idx: jnp.ndarray     # i32[M] owning body slot
    local_pos: jnp.ndarray    # f32[M, 3] offset on the body (ColliderTransform)
    local_quat: jnp.ndarray   # f32[M, 4]
    # Physics material (physics_material.rs:137-146: dynamic + static
    # coefficients, combined independently with the same rule)
    friction: jnp.ndarray            # f32[M] dynamic coefficient
    static_friction: jnp.ndarray     # f32[M] static coefficient
    restitution: jnp.ndarray         # f32[M]
    friction_combine: jnp.ndarray    # i32[M] CoefficientCombine
    restitution_combine: jnp.ndarray  # i32[M]
    density: jnp.ndarray             # f32[M]
    # Filtering (layers.rs)
    layer_members: jnp.ndarray  # u32[M] CollisionLayers memberships
    layer_filter: jnp.ndarray   # u32[M] CollisionLayers filters
    # Flags & margins
    is_sensor: jnp.ndarray           # bool[M]
    active: jnp.ndarray              # bool[M] slot in use and enabled
    collision_margin: jnp.ndarray    # f32[M]
    speculative_margin: jnp.ndarray  # f32[M] (inf = use global default)
    # Derived each step (kept in state for queries/debug): world AABB.
    aabb_min: jnp.ndarray  # f32[M, 3]
    aabb_max: jnp.ndarray  # f32[M, 3]

    @property
    def capacity(self) -> int:
        return self.shape_type.shape[-1]

    def replace(self, **kw):
        return replace(self, **kw)

    @staticmethod
    def zeros(m: int) -> "Colliders":
        f3 = jnp.zeros((m, 3), jnp.float32)
        return Colliders(
            shape_type=jnp.zeros((m,), jnp.int32),
            params=jnp.zeros((m, 8), jnp.float32),
            body_idx=jnp.zeros((m,), jnp.int32),
            local_pos=f3,
            local_quat=quat_m.identity((m,)),
            friction=jnp.full((m,), 0.5, jnp.float32),
            static_friction=jnp.full((m,), 0.5, jnp.float32),
            restitution=jnp.zeros((m,), jnp.float32),
            friction_combine=jnp.zeros((m,), jnp.int32),
            restitution_combine=jnp.zeros((m,), jnp.int32),
            density=jnp.ones((m,), jnp.float32),
            layer_members=jnp.full((m,), 0xFFFFFFFF, jnp.uint32),
            layer_filter=jnp.full((m,), 0xFFFFFFFF, jnp.uint32),
            is_sensor=jnp.zeros((m,), bool),
            active=jnp.zeros((m,), bool),
            collision_margin=jnp.zeros((m,), jnp.float32),
            speculative_margin=jnp.full((m,), _INF, jnp.float32),
            aabb_min=f3,
            aabb_max=f3,
        )


MAX_POINTS = 4  # manifold points per contact pair (Jolt-style pruning, 3D)


@_register
@dataclass(frozen=True)
class Contacts:
    """Persistent contact-pair buffer (the contact graph + manifolds).

    One slot per collider pair; up to ``MAX_POINTS`` points. Anchors are
    world-space offsets from each body's center of mass at manifold
    generation time and stay fixed over the substep loop (reference
    ``contact/mod.rs:167-170``). Warm-start impulses persist across steps and
    are matched by feature id / position (``contact_types/mod.rs:426-472``).
    """

    pair_key: jnp.ndarray     # i32[C] = collider_a * M + collider_b (a < b); -1 empty
    collider_a: jnp.ndarray   # i32[C]
    collider_b: jnp.ndarray   # i32[C]
    body_a: jnp.ndarray       # i32[C]
    body_b: jnp.ndarray       # i32[C]
    active: jnp.ndarray       # bool[C] pair slot in use (AABBs overlap)
    touching: jnp.ndarray     # bool[C] manifold has points this step
    was_touching: jnp.ndarray  # bool[C] previous step (for start/end events)
    is_sensor: jnp.ndarray    # bool[C] sensor pair: events only, no solve
    # Manifold (one normal per pair; world-space, from a to b)
    normal: jnp.ndarray       # f32[C, 3]
    num_points: jnp.ndarray   # i32[C]
    anchor_a: jnp.ndarray     # f32[C, P, 3]
    anchor_b: jnp.ndarray     # f32[C, P, 3]
    penetration: jnp.ndarray  # f32[C, P] (negative = separated)
    feature_id: jnp.ndarray   # i32[C, P]
    # Warm starting + readback
    normal_impulse: jnp.ndarray   # f32[C, P]
    tangent_impulse: jnp.ndarray  # f32[C, P, 2]
    max_normal_impulse: jnp.ndarray  # f32[C, P] total applied (readback/events)
    # Combined material
    friction: jnp.ndarray         # f32[C] dynamic coefficient
    static_friction: jnp.ndarray  # f32[C] static coefficient (stiction)
    restitution: jnp.ndarray      # f32[C]
    # Relative surface velocity (conveyor belts; the reference manifold's
    # ``tangent_velocity``, set via CollisionHooks::modify_contacts).
    surface_velocity: jnp.ndarray  # f32[C, 3]
    # Persistent constraint-graph color (pipeline.coloring); -1 = none.
    color: jnp.ndarray  # i32[C]
    # Stable per-pair contact id (the reference's ContactEdge id,
    # ``contact_types/contact_graph.rs:76``): assigned once when a pair
    # enters the buffer and carried while it persists, even as slots
    # re-shuffle. 0 = none; ids are unique within a World's lifetime.
    contact_id: jnp.ndarray  # i32[C]
    next_contact_id: jnp.ndarray  # i32[] monotonically increasing counter
    # CollisionEnd completeness (``collision_events.rs:256``): pairs that
    # were touching last step and left the buffer entirely this step
    # (AABBs separated, so the broadphase emitted no slot for them).
    # Indexed by LAST step's slot order; consumed via
    # ``api.collisions.ended_evicted`` in the step they occur.
    evicted: jnp.ndarray             # bool[C]
    evicted_contact_id: jnp.ndarray  # i32[C]
    evicted_body_a: jnp.ndarray      # i32[C]
    evicted_body_b: jnp.ndarray      # i32[C]

    @property
    def capacity(self) -> int:
        return self.pair_key.shape[-1]

    def replace(self, **kw):
        return replace(self, **kw)

    @staticmethod
    def zeros(c: int) -> "Contacts":
        p3 = jnp.zeros((c, MAX_POINTS, 3), jnp.float32)
        p1 = jnp.zeros((c, MAX_POINTS), jnp.float32)
        i1 = jnp.zeros((c,), jnp.int32)
        b1 = jnp.zeros((c,), bool)
        return Contacts(
            pair_key=jnp.full((c,), -1, jnp.int32),
            collider_a=i1,
            collider_b=i1,
            body_a=i1,
            body_b=i1,
            active=b1,
            touching=b1,
            was_touching=b1,
            is_sensor=b1,
            normal=jnp.zeros((c, 3), jnp.float32),
            num_points=i1,
            anchor_a=p3,
            anchor_b=p3,
            penetration=p1,
            feature_id=jnp.zeros((c, MAX_POINTS), jnp.int32),
            normal_impulse=p1,
            tangent_impulse=jnp.zeros((c, MAX_POINTS, 2), jnp.float32),
            max_normal_impulse=p1,
            friction=jnp.zeros((c,), jnp.float32),
            static_friction=jnp.zeros((c,), jnp.float32),
            restitution=jnp.zeros((c,), jnp.float32),
            surface_velocity=jnp.zeros((c, 3), jnp.float32),
            color=jnp.full((c,), -1, jnp.int32),
            contact_id=jnp.zeros((c,), jnp.int32),
            next_contact_id=jnp.ones((), jnp.int32),
            evicted=b1,
            evicted_contact_id=i1,
            evicted_body_a=i1,
            evicted_body_b=i1,
        )


@_register
@dataclass(frozen=True)
class Joints:
    """Joint SoA columns (reference ``src/dynamics/joints/``).

    A joint connects ``body_a`` and ``body_b`` with local attachment frames
    (``JointFrame`` = anchor + basis, reference ``joints/mod.rs:754-979``).
    Interpretation of ``limit_min/max`` and the compliance lanes depends on
    the joint type — see ``pipeline/xpbd.py``.
    """

    jtype: jnp.ndarray        # i32[J] JointType
    body_a: jnp.ndarray       # i32[J]
    body_b: jnp.ndarray       # i32[J]
    active: jnp.ndarray       # bool[J]
    frame_pos_a: jnp.ndarray  # f32[J, 3] local anchor on a
    frame_pos_b: jnp.ndarray  # f32[J, 3]
    frame_quat_a: jnp.ndarray  # f32[J, 4] local basis on a
    frame_quat_b: jnp.ndarray  # f32[J, 4]
    # Compliance lanes: (point, align, limit, axial) in m/N or rad/Nm.
    compliance: jnp.ndarray   # f32[J, 4]
    limit_min: jnp.ndarray    # f32[J]
    limit_max: jnp.ndarray    # f32[J]
    limit_enabled: jnp.ndarray  # bool[J]
    # Spherical twist limit about the primary axis
    # (``xpbd/joints/spherical.rs:20-38,76-80``).
    twist_min: jnp.ndarray    # f32[J]
    twist_max: jnp.ndarray    # f32[J]
    twist_enabled: jnp.ndarray  # bool[J]
    lin_damping: jnp.ndarray  # f32[J] JointDamping linear
    ang_damping: jnp.ndarray  # f32[J] JointDamping angular
    collision_disabled: jnp.ndarray  # bool[J] disable contacts between bodies
    # Accumulated Lagrange multipliers for force readback (JointForces):
    # lanes (point_x, point_y, point_z, angular_x, angular_y, angular_z).
    total_lambda: jnp.ndarray  # f32[J, 6]
    # Persistent constraint-graph color (pipeline.coloring); -1 = none.
    color: jnp.ndarray  # i32[J]

    @property
    def capacity(self) -> int:
        return self.jtype.shape[-1]

    def replace(self, **kw):
        return replace(self, **kw)

    @staticmethod
    def zeros(j: int) -> "Joints":
        f3 = jnp.zeros((j, 3), jnp.float32)
        i1 = jnp.zeros((j,), jnp.int32)
        f1 = jnp.zeros((j,), jnp.float32)
        return Joints(
            jtype=i1,
            body_a=i1,
            body_b=i1,
            active=jnp.zeros((j,), bool),
            frame_pos_a=f3,
            frame_pos_b=f3,
            frame_quat_a=quat_m.identity((j,)),
            frame_quat_b=quat_m.identity((j,)),
            compliance=jnp.zeros((j, 4), jnp.float32),
            limit_min=f1,
            limit_max=f1,
            limit_enabled=jnp.zeros((j,), bool),
            twist_min=f1,
            twist_max=f1,
            twist_enabled=jnp.zeros((j,), bool),
            lin_damping=f1,
            ang_damping=f1,
            collision_disabled=jnp.zeros((j,), bool),
            total_lambda=jnp.zeros((j, 6), jnp.float32),
            color=jnp.full((j,), -1, jnp.int32),
        )


@dataclass(frozen=True)
class World:
    """Everything dynamic, in one pytree. ``step(world, config) -> world``.

    ``shape_pairs`` is *static* metadata (not a leaf): the canonical
    (type_a <= type_b) shape pairs this scene can produce, derived by
    ``SceneBuilder.finalize``. The narrowphase only lowers those dispatch
    branches, keeping compiles lean. ``None`` = unknown = all branches.
    """

    bodies: Bodies
    colliders: Colliders
    contacts: Contacts
    joints: Joints
    gravity: jnp.ndarray  # f32[3] (Gravity resource, default (0, -9.81, 0))
    time: jnp.ndarray     # f32[] accumulated simulated time
    # NaN quarantine (SURVEY.md par.5): set when a step produced non-finite
    # state; the step freezes a diverged world instead of propagating NaNs,
    # so one diverged scene can't poison a vmapped batch.
    diverged: jnp.ndarray = None  # bool[]
    # Shared vertex pool for CONVEX colliders (params = offset, count,
    # local AABB half extents). The pool is padded so any
    # [offset, offset + MAX_HULL_VERTS) slice is in bounds.
    convex_verts: jnp.ndarray = None  # f32[V, 3]
    shape_pairs: tuple | None = None
    # Static tuple of user CustomShapes (api/custom_shapes.py); collider
    # code CUSTOM_SHAPE_BASE + i dispatches to entry i. Part of the pytree
    # STRUCTURE (identity-hashed), like shape_pairs. Not serialized by
    # checkpoints — re-attach after restore (functions don't pickle).
    custom_shapes: tuple = ()

    def replace(self, **kw):
        return replace(self, **kw)

    @staticmethod
    def zeros(
        n_bodies: int,
        n_colliders: int | None = None,
        n_contacts: int | None = None,
        n_joints: int = 8,
    ) -> "World":
        m = n_colliders if n_colliders is not None else n_bodies
        c = n_contacts if n_contacts is not None else 8 * m
        return World(
            bodies=Bodies.zeros(n_bodies),
            colliders=Colliders.zeros(m),
            contacts=Contacts.zeros(c),
            joints=Joints.zeros(n_joints),
            gravity=jnp.asarray([0.0, -9.81, 0.0], jnp.float32),
            time=jnp.zeros((), jnp.float32),
            diverged=jnp.zeros((), bool),
            convex_verts=jnp.zeros((1, 3), jnp.float32),
        )


jax.tree_util.register_dataclass(
    World,
    data_fields=[
        "bodies", "colliders", "contacts", "joints", "gravity", "time",
        "diverged", "convex_verts",
    ],
    meta_fields=["shape_pairs", "custom_shapes"],
)
