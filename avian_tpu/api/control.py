"""Simulation control helpers: pausing/stepping is just choosing when to
call ``physics_step`` (``Time<Physics>`` pause/advance, reference
``schedule/time.rs:38-74``); these helpers cover the rest of the control
surface."""

import jax.numpy as jnp

from avian_tpu.core.state import World


def set_gravity(world: World, gravity) -> World:
    """Change gravity and wake everything (the reference wakes all bodies on
    gravity change, ``islands/sleeping.rs:609-618``)."""
    return wake_all(
        world.replace(gravity=jnp.asarray(gravity, jnp.float32))
    )


def wake_all(world: World) -> World:
    b = world.bodies
    return world.replace(
        bodies=b.replace(
            sleeping=jnp.zeros_like(b.sleeping),
            sleep_timer=jnp.zeros_like(b.sleep_timer),
        )
    )


def wake_body(world: World, body) -> World:
    """WakeBody command (wakes the whole island next step via the island
    rules; directly clears this body's state now)."""
    b = world.bodies
    return world.replace(
        bodies=b.replace(
            sleeping=b.sleeping.at[body].set(False),
            sleep_timer=b.sleep_timer.at[body].set(0.0),
        )
    )


def sleep_body(world: World, body) -> World:
    """SleepBody command: force a body asleep (it may be woken by its
    island on the next step if neighbors are active). Works on both the
    3D ``World`` and the 2D ``World2D`` (scalar broadcast zeroing)."""
    b = world.bodies
    return world.replace(
        bodies=b.replace(
            sleeping=b.sleeping.at[body].set(True),
            lin_vel=b.lin_vel.at[body].set(0.0),
            ang_vel=b.ang_vel.at[body].set(0.0),
        )
    )


def set_position(world: World, body, pos, quat=None, angle=None,
                 wake=True) -> World:
    """Teleport a body (user writes to Position/Rotation). Pass ``quat``
    on the 3D profile or ``angle`` on the 2D profile."""
    b = world.bodies
    b = b.replace(pos=b.pos.at[body].set(jnp.asarray(pos, jnp.float32)))
    if quat is not None:
        b = b.replace(quat=b.quat.at[body].set(jnp.asarray(quat, jnp.float32)))
    if angle is not None:
        b = b.replace(
            angle=b.angle.at[body].set(jnp.asarray(angle, jnp.float32))
        )
    world = world.replace(bodies=b)
    return wake_body(world, body) if wake else world


def set_velocity(world: World, body, lin_vel=None, ang_vel=None, wake=True) -> World:
    b = world.bodies
    if lin_vel is not None:
        b = b.replace(lin_vel=b.lin_vel.at[body].set(jnp.asarray(lin_vel, jnp.float32)))
    if ang_vel is not None:
        b = b.replace(ang_vel=b.ang_vel.at[body].set(jnp.asarray(ang_vel, jnp.float32)))
    world = world.replace(bodies=b)
    return wake_body(world, body) if wake else world


def disable_body(world: World, body) -> World:
    """RigidBodyDisabled: remove the body from simulation without losing it."""
    b = world.bodies
    return world.replace(bodies=b.replace(active=b.active.at[body].set(False)))


def enable_body(world: World, body) -> World:
    b = world.bodies
    w = world.replace(bodies=b.replace(active=b.active.at[body].set(True)))
    return wake_body(w, body)
