"""Forces API: functional counterparts of the reference's ``Forces``
accessor (``src/dynamics/rigid_body/forces/query_data.rs:9-26``) and constant
force/torque components (``forces/mod.rs``).

All helpers are pure: they return a new ``World``. ``body`` may be a scalar
index or an index array (batched application). Forces accumulate for the
*next* step and are cleared by it; impulses change velocities immediately.
Waking variants reset the body's sleep timer and clear the sleeping flag
(matching the reference's wake-on-write change detection,
``islands/sleeping.rs:558-606``).
"""

import jax.numpy as jnp

from avian_tpu.core.state import World
from avian_tpu.math import quat as quat_m
from avian_tpu.math import sym3
from avian_tpu.pipeline.solver_body import world_inv_inertia


def _wake(bodies, body):
    return bodies.replace(
        sleeping=bodies.sleeping.at[body].set(False),
        sleep_timer=bodies.sleep_timer.at[body].set(0.0),
    )


def apply_force(world: World, body, force, wake=True) -> World:
    """Accumulate a world-frame force for the next step."""
    b = world.bodies.replace(
        force=world.bodies.force.at[body].add(jnp.asarray(force, jnp.float32))
    )
    return world.replace(bodies=_wake(b, body) if wake else b)


def apply_torque(world: World, body, torque, wake=True) -> World:
    b = world.bodies.replace(
        torque=world.bodies.torque.at[body].add(jnp.asarray(torque, jnp.float32))
    )
    return world.replace(bodies=_wake(b, body) if wake else b)


def apply_force_at_point(world: World, body, force, point, wake=True) -> World:
    """Force at a world-space point: adds the induced torque about the COM."""
    force = jnp.asarray(force, jnp.float32)
    point = jnp.asarray(point, jnp.float32)
    bodies = world.bodies
    com_world = bodies.pos[body] + quat_m.rotate(bodies.quat[body], bodies.com[body])
    torque = jnp.cross(point - com_world, force)
    b = bodies.replace(
        force=bodies.force.at[body].add(force),
        torque=bodies.torque.at[body].add(torque),
    )
    return world.replace(bodies=_wake(b, body) if wake else b)


def apply_linear_impulse(world: World, body, impulse, wake=True) -> World:
    """Immediate velocity change ``dv = J * inv_mass``."""
    impulse = jnp.asarray(impulse, jnp.float32)
    bodies = world.bodies
    dv = impulse * bodies.inv_mass[body][..., None]
    b = bodies.replace(lin_vel=bodies.lin_vel.at[body].add(dv))
    return world.replace(bodies=_wake(b, body) if wake else b)


def apply_angular_impulse(world: World, body, impulse, wake=True) -> World:
    impulse = jnp.asarray(impulse, jnp.float32)
    bodies = world.bodies
    inv_i = world_inv_inertia(bodies)[body]
    dw = sym3.mv(inv_i, impulse)
    b = bodies.replace(ang_vel=bodies.ang_vel.at[body].add(dw))
    return world.replace(bodies=_wake(b, body) if wake else b)


def apply_impulse_at_point(world: World, body, impulse, point, wake=True) -> World:
    impulse = jnp.asarray(impulse, jnp.float32)
    point = jnp.asarray(point, jnp.float32)
    bodies = world.bodies
    com_world = bodies.pos[body] + quat_m.rotate(bodies.quat[body], bodies.com[body])
    world = apply_linear_impulse(world, body, impulse, wake)
    return apply_angular_impulse(
        world, body, jnp.cross(point - com_world, impulse), wake
    )


def set_constant_force(world: World, body, force, local=False) -> World:
    """ConstantForce / ConstantLocalForce (``forces/mod.rs:260,371``)."""
    f = jnp.asarray(force, jnp.float32)
    bodies = world.bodies
    if local:
        bodies = bodies.replace(
            const_local_force=bodies.const_local_force.at[body].set(f)
        )
    else:
        bodies = bodies.replace(const_force=bodies.const_force.at[body].set(f))
    return world.replace(bodies=bodies)


def set_constant_torque(world: World, body, torque, local=False) -> World:
    t = jnp.asarray(torque, jnp.float32)
    bodies = world.bodies
    if local:
        bodies = bodies.replace(
            const_local_torque=bodies.const_local_torque.at[body].set(t)
        )
    else:
        bodies = bodies.replace(const_torque=bodies.const_torque.at[body].set(t))
    return world.replace(bodies=bodies)


def set_constant_acceleration(world: World, body, lin=None, ang=None, local=False) -> World:
    """ConstantLinearAcceleration / ConstantAngularAcceleration
    (``forces/mod.rs:494-651``)."""
    bodies = world.bodies
    if lin is not None:
        lin = jnp.asarray(lin, jnp.float32)
        field = "const_local_lin_acc" if local else "const_lin_acc"
        bodies = bodies.replace(
            **{field: getattr(bodies, field).at[body].set(lin)}
        )
    if ang is not None:
        ang = jnp.asarray(ang, jnp.float32)
        field = "const_local_ang_acc" if local else "const_ang_acc"
        bodies = bodies.replace(
            **{field: getattr(bodies, field).at[body].set(ang)}
        )
    return world.replace(bodies=bodies)
