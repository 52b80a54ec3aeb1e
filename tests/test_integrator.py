"""Integrator unit tests (golden trajectories, mirroring the reference's
``integrator/mod.rs:561-629`` test style)."""

import numpy as np
import jax.numpy as jnp

from avian_tpu.core.builder import SceneBuilder
from avian_tpu.core.types import BodyType, LOCK_TX, LOCK_RZ
from avian_tpu.pipeline import integrator as integ
from avian_tpu.pipeline import solver_body as sb


def _single_body(**kw):
    b = SceneBuilder()
    i = b.add_body(mass=1.0, inertia=(1.0, 1.0, 1.0), **kw)
    return b.finalize(max_bodies=1, max_colliders=1), i


def _run_steps(world, steps, dt, substeps=1):
    import jax
    from functools import partial

    h = dt / substeps

    @partial(jax.jit, static_argnums=(2,))
    def run(bodies, gravity, steps):
        def one_step(_, bodies):
            s = sb.prepare(bodies)
            inc = integ.pre_process_velocity_increments(bodies, gravity, h)
            for _ in range(substeps):
                s = integ.integrate_velocities(s, inc, bodies, h)
                s = integ.clamp_velocities(s, bodies)
                s = integ.integrate_positions(s, h)
            return sb.writeback(bodies, s)

        return jax.lax.fori_loop(0, steps, one_step, bodies)

    return run(world.bodies, world.gravity, steps)


def test_projectile_semi_implicit_euler():
    dt = 1.0 / 60.0
    world, i = _single_body(pos=(0, 0, 0), lin_vel=(2.0, 5.0, 0.0))
    bodies = _run_steps(world, 100, dt)
    # Semi-implicit Euler: v_n = v0 + n g dt; x_n = x0 + sum v_k dt.
    g = -9.81
    n = 100
    vy = 5.0 + n * g * dt
    y = sum((5.0 + k * g * dt) * dt for k in range(1, n + 1))
    x = 2.0 * n * dt
    np.testing.assert_allclose(float(bodies.lin_vel[i][1]), vy, rtol=1e-4)
    np.testing.assert_allclose(float(bodies.pos[i][1]), y, rtol=1e-3)
    np.testing.assert_allclose(float(bodies.pos[i][0]), x, rtol=1e-4)


def test_angular_velocity_rotation():
    dt = 1.0 / 60.0
    world, i = _single_body(ang_vel=(0.0, 0.0, 2.0), gravity_scale=0.0)
    bodies = _run_steps(world, 60, dt)
    # After 1 s at 2 rad/s about Z.
    from avian_tpu.math import quat

    angle = 2.0
    expected = quat.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(angle))
    q = np.asarray(bodies.quat[i])
    e = np.asarray(expected)
    assert min(np.abs(q - e).max(), np.abs(q + e).max()) < 1e-3


def test_damping():
    dt = 1.0 / 60.0
    world, i = _single_body(
        lin_vel=(1.0, 0.0, 0.0), gravity_scale=0.0, lin_damping=2.0
    )
    bodies = _run_steps(world, 60, dt)
    # v_{n+1} = v_n / (1 + dt c): after 60 steps.
    v = 1.0 / (1.0 + dt * 2.0) ** 60
    np.testing.assert_allclose(float(bodies.lin_vel[i][0]), v, rtol=1e-4)


def test_locked_axes_and_max_speed():
    dt = 1.0 / 60.0
    b = SceneBuilder()
    i = b.add_body(
        mass=1.0,
        inertia=(1.0, 1.0, 1.0),
        lin_vel=(3.0, 0.0, 0.0),
        locked_axes=LOCK_TX | LOCK_RZ,
        max_lin_speed=1.0,
    )
    world = b.finalize(max_bodies=1, max_colliders=1)
    bodies = _run_steps(world, 30, dt)
    # Gravity pulls -Y; locked X translation means no motion in X from
    # forces, but the initial velocity is untouched (locking only masks
    # applied accelerations/impulses) — max_lin_speed clamps overall speed.
    speed = float(np.linalg.norm(np.asarray(bodies.lin_vel[i])))
    assert speed <= 1.0 + 1e-5


def test_gyroscopic_momentum_conserved():
    dt = 1.0 / 240.0
    b = SceneBuilder()
    # Dzhanibekov-style body: very unequal principal inertia, spin about
    # the intermediate axis plus a small perturbation.
    i = b.add_body(
        mass=1.0,
        inertia=(0.1, 1.0, 2.0),
        ang_vel=(0.01, 5.0, 0.01),
        gravity_scale=0.0,
        gyroscopic=True,
    )
    world = b.finalize(max_bodies=1, max_colliders=1)
    from avian_tpu.math import quat, sym3

    def momentum(bodies):
        q = bodies.quat[i]
        local_w = quat.rotate_inv(q, bodies.ang_vel[i])
        inertia = sym3.inverse_or_zero(bodies.inv_inertia[i])
        return float(np.linalg.norm(np.asarray(sym3.mv(inertia, local_w))))

    l0 = momentum(world.bodies)
    bodies = _run_steps(world, 240, dt)
    l1 = momentum(bodies)
    np.testing.assert_allclose(l1, l0, rtol=1e-3)
    # The tumbling must actually change the spin axis (Dzhanibekov effect).
    w = np.asarray(bodies.ang_vel[i])
    assert abs(w[0]) + abs(w[2]) > 0.05
