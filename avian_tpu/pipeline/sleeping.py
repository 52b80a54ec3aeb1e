"""Island-based sleeping as a pure per-step computation.

Re-design of the reference's persistent islands + deferred sleep/wake
commands (``src/dynamics/solver/islands/``): instead of maintaining an
incremental union-find with merge/split events, we recompute island labels
each step with label propagation + pointer jumping over the contact/joint
adjacency (SURVEY.md §2c item 5), and derive sleep state declaratively:

- a body's sleep timer accumulates while both velocities are below the
  thresholds (``rigid_body/sleeping.rs:84-97``), else resets;
- an island sleeps iff *every* body in it has timer >= TimeToSleep
  (``islands/sleeping.rs:184-280``) — so any new fast contact (including a
  moving kinematic body) joining the island wakes everyone, which reproduces
  the reference's wake-on-contact behavior without an event system.

Sleeping bodies get zeroed velocities and are masked out of integration and
impulse response by ``solver_body.prepare``.
"""

import jax
import jax.numpy as jnp

from avian_tpu.core import types
from avian_tpu.core.config import PhysicsConfig
from avian_tpu.core.state import Bodies, Contacts, Joints

# 1-hop relax + pointer jumping per round; pointer jumping doubles reach, so
# 10 rounds cover chains far beyond any practical island diameter.
_LABEL_ROUNDS = 10
_MAX_DEGREE = 24  # neighbor-table cap; overflowing bodies never sleep


def compute_islands(bodies: Bodies, contacts: Contacts, joints: Joints):
    """i32[N] island label (min body index in the connected component).

    Edges: touching non-sensor contacts and active joints, between
    non-static bodies. Static bodies never join islands (they'd merge
    everything through the ground).
    """
    n = bodies.capacity
    non_static = bodies.active & (bodies.body_type != types.BodyType.STATIC)

    ca = contacts.body_a
    cb = contacts.body_b
    c_ok = (
        contacts.active
        & contacts.touching
        & ~contacts.is_sensor
        & non_static[ca]
        & non_static[cb]
    )
    ja = joints.body_a
    jb = joints.body_b
    j_ok = joints.active & non_static[ja] & non_static[jb]

    ea = jnp.concatenate([ca, ja])
    eb = jnp.concatenate([cb, jb])
    e_ok = jnp.concatenate([c_ok, j_ok])

    # Build a fixed-degree neighbor table once (one sort), so each label
    # round is a [N, D] gather + row-min — duplicate-index scatter-mins are
    # slow on TPU. Bodies whose adjacency overflows the degree cap are
    # reported so sleeping can be conservatively disabled for them.
    src = jnp.concatenate([ea, eb])
    dst = jnp.concatenate([eb, ea])
    ok2 = jnp.concatenate([e_ok, e_ok])
    d = _MAX_DEGREE
    key = jnp.where(ok2, dst, n)
    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    # Rank within each body's run via cummax run-start (searchsorted's
    # binary search costs ~17 dependent gather rounds on this runtime).
    idxs = jnp.arange(src.shape[0])
    new_run = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]]
    )
    rank = idxs - jax.lax.cummax(jnp.where(new_run, idxs, 0))
    slot_ok = (rank < d) & (sorted_key < n)
    slot = jnp.clip(sorted_key, 0, n - 1) * d + rank
    table = jnp.full((n * d + 1,), n, jnp.int32)
    table = table.at[jnp.where(slot_ok, slot, n * d)].set(
        src[order].astype(jnp.int32), mode="drop"
    )
    neighbors = table[:-1].reshape(n, d)  # neighbor body ids; n = empty
    overflow_body = jnp.zeros((n + 1,), bool).at[
        jnp.where(slot_ok | ~ok2, n, jnp.clip(sorted_key, 0, n))
    ].set(True, mode="drop")[:n]

    label = jnp.arange(n, dtype=jnp.int32)
    label_pad = None
    for _ in range(_LABEL_ROUNDS):
        label_pad = jnp.concatenate([label, jnp.asarray([n], jnp.int32)])
        label = jnp.minimum(label, jnp.min(label_pad[neighbors], axis=1))
        # Pointer jumping: labels are body indices, so chase one level.
        label = jnp.minimum(label, label[label])
    return label, overflow_body


def update_sleeping(
    bodies: Bodies, contacts: Contacts, joints: Joints, config: PhysicsConfig
) -> Bodies:
    if not config.sleeping_enabled:
        island, _ = compute_islands(bodies, contacts, joints)
        return bodies.replace(island=island)

    n = bodies.capacity
    lin_t = config.sleep_linear_threshold * config.length_unit
    ang_t = config.sleep_angular_threshold

    # Wake-on-user-write falls out of this declarative formulation
    # (``islands/sleeping.rs:558-606`` change-detection semantics):
    # - velocity writes: sleeping bodies have zeroed velocities, so a
    #   direct write to ``bodies.lin_vel``/``ang_vel`` makes ``below``
    #   false, which un-readies (wakes) the whole island;
    # - position writes: sleeping bodies are never integrated, so a live
    #   pose that differs from the ``sleep_pos``/``sleep_quat`` snapshot
    #   taken at the end of the previous step means the user teleported
    #   the body by writing the pytree directly — treat it as not
    #   sleep-ready, which wakes its island the same way.
    teleported = bodies.sleeping & (
        jnp.any(jnp.abs(bodies.pos - bodies.sleep_pos) > 1e-6, axis=-1)
        | jnp.any(jnp.abs(bodies.quat - bodies.sleep_quat) > 1e-6, axis=-1)
    )
    # Wake the teleported body's *previous* island, not just the current
    # one: moving it away severs its contacts this very step, but the
    # bodies it was resting on/under must wake (they may be unsupported
    # now). ``bodies.island`` still holds last step's labels here.
    tele_island = jnp.zeros((n + 1,), bool).at[
        jnp.where(teleported, bodies.island, n)
    ].set(True, mode="drop")[:n]
    teleported = teleported | tele_island[bodies.island]
    below = (
        (jnp.sum(bodies.lin_vel**2, axis=-1) < lin_t * lin_t)
        & (jnp.sum(bodies.ang_vel**2, axis=-1) < ang_t * ang_t)
        & ~bodies.sleep_disabled
        & ~teleported
    )
    timer = jnp.where(below, bodies.sleep_timer + config.dt, 0.0)

    island, overflow = compute_islands(bodies, contacts, joints)

    # An island can sleep iff all its non-static members are sleep-ready.
    # Bodies whose adjacency overflowed the island neighbor table might be
    # connected to awake bodies we can't see -> conservatively not ready.
    ready = (timer >= config.time_to_sleep) & ~overflow
    considered = bodies.active & (bodies.body_type != types.BodyType.STATIC)
    all_ready = jnp.ones((n,), bool).at[island].min(
        jnp.where(considered, ready, True)
    )
    sleep = considered & all_ready[island] & (
        bodies.body_type == types.BodyType.DYNAMIC
    )

    woke = bodies.sleeping & ~sleep
    timer = jnp.where(woke, 0.0, timer)

    z3 = jnp.zeros_like(bodies.lin_vel)
    return bodies.replace(
        sleeping=sleep,
        sleep_timer=timer,
        island=island,
        lin_vel=jnp.where(sleep[:, None], z3, bodies.lin_vel),
        ang_vel=jnp.where(sleep[:, None], z3, bodies.ang_vel),
        sleep_pos=bodies.pos,
        sleep_quat=bodies.quat,
    )
