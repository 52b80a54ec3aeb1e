"""2D world state: fixed-capacity SoA pytree with scalar rotations.

2D counterpart of ``avian_tpu/core/state.py``; mirrors the reference's 2D
component set (``RigidBody`` with ``Rotation { cos, sin }``,
``src/physics_transform/transform.rs:175-183``; scalar ``AngularInertia``,
``components/mod.rs:326``). Rotation is stored as the angle in radians —
the solver works on scalar angle deltas, trig happens once per
manifold/writeback, exactly where the reference evaluates its unit complex
number.

Every collider is a rounded convex polygon (see package docstring):
``poly_verts`` f32[M, V, 2] local-frame vertices (first ``vert_count``
valid, rest duplicated), plus ``radius``. Half-spaces set
``is_plane``; their ``poly_verts[0]`` holds the outward normal.
"""

from dataclasses import dataclass, fields, replace

import jax
import jax.numpy as jnp

_INF = float("inf")

MAX_POLY_VERTS = 8
MAX_POINTS_2D = 2  # manifold points per pair (2D arrayvec, contact_types/mod.rs:342)

# Locked-axes bits (2D subset of types.LOCK_*).
LOCK_TX = 1
LOCK_TY = 2
LOCK_ROT = 4


def _register(cls):
    jax.tree_util.register_dataclass(
        cls, data_fields=[f.name for f in fields(cls)], meta_fields=[]
    )
    return cls


@_register
@dataclass(frozen=True)
class Bodies2D:
    pos: jnp.ndarray        # f32[N, 2]
    angle: jnp.ndarray      # f32[N] radians
    lin_vel: jnp.ndarray    # f32[N, 2]
    ang_vel: jnp.ndarray    # f32[N]
    inv_mass: jnp.ndarray   # f32[N]
    inv_inertia: jnp.ndarray  # f32[N] scalar (2D AngularInertia)
    com: jnp.ndarray        # f32[N, 2] local center of mass
    gravity_scale: jnp.ndarray  # f32[N]
    lin_damping: jnp.ndarray    # f32[N]
    ang_damping: jnp.ndarray    # f32[N]
    max_lin_speed: jnp.ndarray  # f32[N]
    max_ang_speed: jnp.ndarray  # f32[N]
    dominance: jnp.ndarray      # i32[N]
    body_type: jnp.ndarray  # i32[N] BodyType
    active: jnp.ndarray     # bool[N]
    locked_axes: jnp.ndarray  # i32[N] LOCK_TX/TY/ROT bits
    force: jnp.ndarray      # f32[N, 2] per-step accumulator
    torque: jnp.ndarray     # f32[N] per-step accumulator
    const_force: jnp.ndarray   # f32[N, 2]
    const_torque: jnp.ndarray  # f32[N]
    sleeping: jnp.ndarray     # bool[N]
    sleep_timer: jnp.ndarray  # f32[N]
    sleep_disabled: jnp.ndarray  # bool[N]
    island: jnp.ndarray     # i32[N]
    swept_ccd: jnp.ndarray  # bool[N] opt-in swept CCD (SweptCcd)
    swept_ccd_nonlinear: jnp.ndarray  # bool[N] SweepMode::NonLinear

    @property
    def capacity(self) -> int:
        return self.pos.shape[-2]

    def replace(self, **kw):
        return replace(self, **kw)

    @staticmethod
    def zeros(n: int) -> "Bodies2D":
        f2 = jnp.zeros((n, 2), jnp.float32)
        f1 = jnp.zeros((n,), jnp.float32)
        return Bodies2D(
            pos=f2,
            angle=f1,
            lin_vel=f2,
            ang_vel=f1,
            inv_mass=f1,
            inv_inertia=f1,
            com=f2,
            gravity_scale=jnp.ones((n,), jnp.float32),
            lin_damping=f1,
            ang_damping=f1,
            max_lin_speed=jnp.full((n,), _INF, jnp.float32),
            max_ang_speed=jnp.full((n,), _INF, jnp.float32),
            dominance=jnp.zeros((n,), jnp.int32),
            body_type=jnp.zeros((n,), jnp.int32),
            active=jnp.zeros((n,), bool),
            locked_axes=jnp.zeros((n,), jnp.int32),
            force=f2,
            torque=f1,
            const_force=f2,
            const_torque=f1,
            sleeping=jnp.zeros((n,), bool),
            sleep_timer=f1,
            sleep_disabled=jnp.zeros((n,), bool),
            island=jnp.zeros((n,), jnp.int32),
            swept_ccd=jnp.zeros((n,), bool),
            swept_ccd_nonlinear=jnp.zeros((n,), bool),
        )


@_register
@dataclass(frozen=True)
class Colliders2D:
    poly_verts: jnp.ndarray  # f32[M, V, 2] local vertices (plane: [0]=normal)
    vert_count: jnp.ndarray  # i32[M]
    radius: jnp.ndarray      # f32[M] rounding radius
    is_plane: jnp.ndarray    # bool[M] half-space
    shape_tag: jnp.ndarray   # i32[M] constructor tag (API/debug only)
    body_idx: jnp.ndarray    # i32[M]
    local_pos: jnp.ndarray   # f32[M, 2]
    local_angle: jnp.ndarray  # f32[M]
    friction: jnp.ndarray         # f32[M] dynamic coefficient
    static_friction: jnp.ndarray  # f32[M]
    restitution: jnp.ndarray      # f32[M]
    friction_combine: jnp.ndarray     # i32[M]
    restitution_combine: jnp.ndarray  # i32[M]
    density: jnp.ndarray          # f32[M]
    layer_members: jnp.ndarray  # u32[M]
    layer_filter: jnp.ndarray   # u32[M]
    is_sensor: jnp.ndarray      # bool[M]
    active: jnp.ndarray         # bool[M]
    collision_margin: jnp.ndarray    # f32[M]
    speculative_margin: jnp.ndarray  # f32[M]
    aabb_min: jnp.ndarray  # f32[M, 2]
    aabb_max: jnp.ndarray  # f32[M, 2]

    @property
    def capacity(self) -> int:
        return self.vert_count.shape[-1]

    def replace(self, **kw):
        return replace(self, **kw)

    @staticmethod
    def zeros(m: int) -> "Colliders2D":
        f2 = jnp.zeros((m, 2), jnp.float32)
        return Colliders2D(
            poly_verts=jnp.zeros((m, MAX_POLY_VERTS, 2), jnp.float32),
            vert_count=jnp.ones((m,), jnp.int32),
            radius=jnp.zeros((m,), jnp.float32),
            is_plane=jnp.zeros((m,), bool),
            shape_tag=jnp.zeros((m,), jnp.int32),
            body_idx=jnp.zeros((m,), jnp.int32),
            local_pos=f2,
            local_angle=jnp.zeros((m,), jnp.float32),
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
            aabb_min=f2,
            aabb_max=f2,
        )


@_register
@dataclass(frozen=True)
class Contacts2D:
    """Persistent 2D contact buffer (<= 2 points per pair)."""

    pair_key: jnp.ndarray    # i32[C]; -1 empty
    collider_a: jnp.ndarray  # i32[C]
    collider_b: jnp.ndarray  # i32[C]
    body_a: jnp.ndarray      # i32[C]
    body_b: jnp.ndarray      # i32[C]
    active: jnp.ndarray      # bool[C]
    touching: jnp.ndarray    # bool[C]
    was_touching: jnp.ndarray  # bool[C]
    is_sensor: jnp.ndarray   # bool[C]
    normal: jnp.ndarray      # f32[C, 2] world, a -> b
    num_points: jnp.ndarray  # i32[C]
    anchor_a: jnp.ndarray    # f32[C, P, 2] world offsets from COM a
    anchor_b: jnp.ndarray    # f32[C, P, 2]
    penetration: jnp.ndarray  # f32[C, P]
    feature_id: jnp.ndarray  # i32[C, P]
    normal_impulse: jnp.ndarray   # f32[C, P]
    tangent_impulse: jnp.ndarray  # f32[C, P] scalar in 2D
    max_normal_impulse: jnp.ndarray  # f32[C, P]
    friction: jnp.ndarray         # f32[C]
    static_friction: jnp.ndarray  # f32[C]
    restitution: jnp.ndarray      # f32[C]
    surface_speed: jnp.ndarray    # f32[C] tangent surface speed (conveyors)
    color: jnp.ndarray       # i32[C]
    contact_id: jnp.ndarray  # i32[C]
    next_contact_id: jnp.ndarray  # i32[]
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
    def zeros(c: int) -> "Contacts2D":
        p2 = jnp.zeros((c, MAX_POINTS_2D, 2), jnp.float32)
        p1 = jnp.zeros((c, MAX_POINTS_2D), jnp.float32)
        i1 = jnp.zeros((c,), jnp.int32)
        b1 = jnp.zeros((c,), bool)
        f1 = jnp.zeros((c,), jnp.float32)
        return Contacts2D(
            pair_key=jnp.full((c,), -1, jnp.int32),
            collider_a=i1,
            collider_b=i1,
            body_a=i1,
            body_b=i1,
            active=b1,
            touching=b1,
            was_touching=b1,
            is_sensor=b1,
            normal=jnp.zeros((c, 2), jnp.float32),
            num_points=i1,
            anchor_a=p2,
            anchor_b=p2,
            penetration=p1,
            feature_id=jnp.zeros((c, MAX_POINTS_2D), jnp.int32),
            normal_impulse=p1,
            tangent_impulse=p1,
            max_normal_impulse=p1,
            friction=f1,
            static_friction=f1,
            restitution=f1,
            surface_speed=f1,
            color=jnp.full((c,), -1, jnp.int32),
            contact_id=i1,
            next_contact_id=jnp.ones((), jnp.int32),
            evicted=b1,
            evicted_contact_id=i1,
            evicted_body_a=i1,
            evicted_body_b=i1,
        )


@_register
@dataclass(frozen=True)
class Joints2D:
    """2D joints: FIXED, DISTANCE, REVOLUTE, PRISMATIC (JointType values).

    ``axis_angle`` is the local prismatic axis direction on body a;
    ``reference_angle`` the rest relative angle (fixed/prismatic align to
    it; revolute limits measure from it)."""

    jtype: jnp.ndarray      # i32[J]
    body_a: jnp.ndarray     # i32[J]
    body_b: jnp.ndarray     # i32[J]
    active: jnp.ndarray     # bool[J]
    anchor_a: jnp.ndarray   # f32[J, 2] local
    anchor_b: jnp.ndarray   # f32[J, 2]
    axis_angle: jnp.ndarray       # f32[J]
    reference_angle: jnp.ndarray  # f32[J]
    compliance: jnp.ndarray  # f32[J, 4] (point, align, limit, _)
    limit_min: jnp.ndarray   # f32[J]
    limit_max: jnp.ndarray   # f32[J]
    limit_enabled: jnp.ndarray  # bool[J]
    lin_damping: jnp.ndarray  # f32[J]
    ang_damping: jnp.ndarray  # f32[J]
    collision_disabled: jnp.ndarray  # bool[J]
    total_lambda: jnp.ndarray  # f32[J, 3] (point_x, point_y, angular)
    color: jnp.ndarray  # i32[J]

    @property
    def capacity(self) -> int:
        return self.jtype.shape[-1]

    def replace(self, **kw):
        return replace(self, **kw)

    @staticmethod
    def zeros(j: int) -> "Joints2D":
        f2 = jnp.zeros((j, 2), jnp.float32)
        i1 = jnp.zeros((j,), jnp.int32)
        f1 = jnp.zeros((j,), jnp.float32)
        return Joints2D(
            jtype=i1,
            body_a=i1,
            body_b=i1,
            active=jnp.zeros((j,), bool),
            anchor_a=f2,
            anchor_b=f2,
            axis_angle=f1,
            reference_angle=f1,
            compliance=jnp.zeros((j, 4), jnp.float32),
            limit_min=f1,
            limit_max=f1,
            limit_enabled=jnp.zeros((j,), bool),
            lin_damping=f1,
            ang_damping=f1,
            collision_disabled=jnp.zeros((j,), bool),
            total_lambda=jnp.zeros((j, 3), jnp.float32),
            color=jnp.full((j,), -1, jnp.int32),
        )


@dataclass(frozen=True)
class World2D:
    bodies: Bodies2D
    colliders: Colliders2D
    contacts: Contacts2D
    joints: Joints2D
    gravity: jnp.ndarray  # f32[2] (default (0, -9.81))
    time: jnp.ndarray     # f32[]
    diverged: jnp.ndarray = None  # bool[]

    def replace(self, **kw):
        return replace(self, **kw)

    @staticmethod
    def zeros(
        n_bodies: int,
        n_colliders: int | None = None,
        n_contacts: int | None = None,
        n_joints: int = 8,
    ) -> "World2D":
        m = n_colliders if n_colliders is not None else n_bodies
        c = n_contacts if n_contacts is not None else 8 * m
        return World2D(
            bodies=Bodies2D.zeros(n_bodies),
            colliders=Colliders2D.zeros(m),
            contacts=Contacts2D.zeros(c),
            joints=Joints2D.zeros(n_joints),
            gravity=jnp.asarray([0.0, -9.81], jnp.float32),
            time=jnp.zeros((), jnp.float32),
            diverged=jnp.zeros((), bool),
        )


jax.tree_util.register_dataclass(
    World2D,
    data_fields=[
        "bodies", "colliders", "contacts", "joints", "gravity", "time",
        "diverged",
    ],
    meta_fields=[],
)
