"""Collision read API + events.

Counterparts of the reference's ``Collisions`` system param
(``contact_types/system_param.rs:53``: get/iter/contains/collisions_with/
entities_colliding_with), ``CollidingEntities``, and the
``CollisionStart``/``CollisionEnd`` events (``collision_events.rs:171,268``).

In the array world, "events" are masks over the persistent contact buffer:
``started(world)`` is true for pairs touching now that weren't last step.
"""

import jax.numpy as jnp

from avian_tpu.core.state import World


def touching(world: World):
    """bool[C]: contact pairs currently touching."""
    return world.contacts.active & world.contacts.touching


def started(world: World):
    """bool[C]: pairs that began touching this step (CollisionStart)."""
    c = world.contacts
    return c.active & c.touching & ~c.was_touching


def ended(world: World):
    """bool[C]: pairs that stopped touching this step (CollisionEnd),
    but are still tracked in the buffer (AABBs still overlap).

    Pairs that separated so fast their AABBs no longer overlap leave the
    buffer entirely; those fire through :func:`ended_evicted` instead.
    Full CollisionEnd coverage (``collision_events.rs:256``) is the union.
    """
    c = world.contacts
    return c.active & ~c.touching & c.was_touching


def ended_evicted(world: World):
    """(mask, contact_id, body_a, body_b): pairs that were touching last
    step and left the contact buffer this step (CollisionEnd on eviction,
    ``collision_events.rs:256``). Arrays are indexed by LAST step's slot
    order and valid only where ``mask`` is True; each eviction is
    reported exactly once, in the step the pair disappeared."""
    c = world.contacts
    return c.evicted, c.evicted_contact_id, c.evicted_body_a, c.evicted_body_b


def contact_ids(world: World):
    """i32[C]: the stable id of each tracked contact pair (0 = empty slot).

    Ids persist while a pair stays in the buffer even as slots re-shuffle
    (the reference's stable ``ContactEdge`` ids,
    ``contact_types/contact_graph.rs:76``) — use together with
    :func:`started`/:func:`ended` masks to build user-facing event
    streams keyed by contact identity."""
    return jnp.where(world.contacts.active, world.contacts.contact_id, 0)


def contains(world: World, body_a, body_b):
    """True if the two bodies are touching (``Collisions::contains``)."""
    c = world.contacts
    m = touching(world)
    hit = m & (
        ((c.body_a == body_a) & (c.body_b == body_b))
        | ((c.body_a == body_b) & (c.body_b == body_a))
    )
    return jnp.any(hit)


def get(world: World, body_a, body_b):
    """Index of the contact-pair slot between two bodies, or -1."""
    c = world.contacts
    m = c.active & (
        ((c.body_a == body_a) & (c.body_b == body_b))
        | ((c.body_a == body_b) & (c.body_b == body_a))
    )
    idx = jnp.argmax(m)
    return jnp.where(jnp.any(m), idx, -1).astype(jnp.int32)


def collisions_with(world: World, body):
    """bool[C]: touching pairs involving ``body``."""
    c = world.contacts
    return touching(world) & ((c.body_a == body) | (c.body_b == body))


def entities_colliding_with(world: World, body, max_hits: int = 16):
    """Body indices touching ``body``, padded with -1 (CollidingEntities)."""
    import jax

    c = world.contacts
    m = collisions_with(world, body)
    other = jnp.where(c.body_a == body, c.body_b, c.body_a)
    score = jnp.where(m, 1.0, 0.0)
    _, idx = jax.lax.top_k(score, max_hits)
    return jnp.where(m[idx], other[idx], -1).astype(jnp.int32)


def total_normal_impulse(world: World):
    """f32[C]: total normal impulse magnitude applied per pair this step
    (``ContactPoint::normal_impulse`` readback)."""
    return jnp.sum(world.contacts.max_normal_impulse, axis=-1)
