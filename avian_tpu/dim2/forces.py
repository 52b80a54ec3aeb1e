"""2D forces API: the reference's ``Forces`` accessor on the [N,2] profile
(``src/dynamics/rigid_body/forces/query_data.rs:9-26`` compiled as
``avian2d``; same helper set as the 3D ``avian_tpu/api/forces.py``).

All helpers are pure and accept a scalar or array ``body`` index. Torques,
angular impulses and angular velocities are scalars (2D cross product
``r x f = r.x * f.y - r.y * f.x``).
"""

import jax.numpy as jnp

from avian_tpu.dim2.narrowphase import rot, rotate
from avian_tpu.dim2.state import World2D


def _cross2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _wake(bodies, body):
    return bodies.replace(
        sleeping=bodies.sleeping.at[body].set(False),
        sleep_timer=bodies.sleep_timer.at[body].set(0.0),
    )


def _com_world(bodies, body):
    c, s = rot(bodies.angle[body])
    return bodies.pos[body] + rotate(c, s, bodies.com[body])


def apply_force(world: World2D, body, force, wake=True) -> World2D:
    """Accumulate a world-frame force for the next step."""
    b = world.bodies.replace(
        force=world.bodies.force.at[body].add(jnp.asarray(force, jnp.float32))
    )
    return world.replace(bodies=_wake(b, body) if wake else b)


def apply_torque(world: World2D, body, torque, wake=True) -> World2D:
    b = world.bodies.replace(
        torque=world.bodies.torque.at[body].add(
            jnp.asarray(torque, jnp.float32)
        )
    )
    return world.replace(bodies=_wake(b, body) if wake else b)


def apply_force_at_point(world: World2D, body, force, point,
                         wake=True) -> World2D:
    """Force at a world-space point: adds the induced torque about the COM."""
    force = jnp.asarray(force, jnp.float32)
    point = jnp.asarray(point, jnp.float32)
    bodies = world.bodies
    torque = _cross2(point - _com_world(bodies, body), force)
    b = bodies.replace(
        force=bodies.force.at[body].add(force),
        torque=bodies.torque.at[body].add(torque),
    )
    return world.replace(bodies=_wake(b, body) if wake else b)


def apply_linear_impulse(world: World2D, body, impulse, wake=True) -> World2D:
    """Immediate velocity change ``dv = J * inv_mass``."""
    impulse = jnp.asarray(impulse, jnp.float32)
    bodies = world.bodies
    dv = impulse * bodies.inv_mass[body][..., None]
    b = bodies.replace(lin_vel=bodies.lin_vel.at[body].add(dv))
    return world.replace(bodies=_wake(b, body) if wake else b)


def apply_angular_impulse(world: World2D, body, impulse, wake=True) -> World2D:
    impulse = jnp.asarray(impulse, jnp.float32)
    bodies = world.bodies
    dw = impulse * bodies.inv_inertia[body]
    b = bodies.replace(ang_vel=bodies.ang_vel.at[body].add(dw))
    return world.replace(bodies=_wake(b, body) if wake else b)


def apply_impulse_at_point(world: World2D, body, impulse, point,
                           wake=True) -> World2D:
    impulse = jnp.asarray(impulse, jnp.float32)
    point = jnp.asarray(point, jnp.float32)
    com_world = _com_world(world.bodies, body)
    world = apply_linear_impulse(world, body, impulse, wake)
    return apply_angular_impulse(
        world, body, _cross2(point - com_world, impulse), wake
    )


def set_constant_force(world: World2D, body, force) -> World2D:
    """``ConstantForce`` (``forces/mod.rs:260``)."""
    bodies = world.bodies.replace(
        const_force=world.bodies.const_force.at[body].set(
            jnp.asarray(force, jnp.float32)
        )
    )
    return world.replace(bodies=bodies)


def set_constant_torque(world: World2D, body, torque) -> World2D:
    """``ConstantTorque`` (``forces/mod.rs:317``)."""
    bodies = world.bodies.replace(
        const_torque=world.bodies.const_torque.at[body].set(
            jnp.asarray(torque, jnp.float32)
        )
    )
    return world.replace(bodies=bodies)
