"""Per-scene NaN quarantine: a deliberately-poisoned scene inside a vmapped
batch freezes (flagged) without touching the other scenes' trajectories
(SURVEY.md par.5 failure recovery; reference debug asserts
``schedule/mod.rs:295-321``)."""

import jax
import jax.numpy as jnp
import numpy as np

from avian_tpu import BodyType, PhysicsConfig, SceneBuilder, physics_step
from avian_tpu.parallel import replicate_world

CFG = PhysicsConfig(max_colors=4, shape_pairs=((0, 0), (0, 3)))


def _world():
    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0))
    ball = b.add_body(pos=(0, 2.0, 0))
    b.sphere(ball, 0.5)
    return b.finalize(max_bodies=4, max_colliders=4, max_contacts=16), ball


def test_poisoned_scene_quarantined_others_untouched():
    world, ball = _world()
    batch = replicate_world(world, 4)
    # Poison scene 2 with an inf velocity.
    vel = np.array(batch.bodies.lin_vel)
    vel[2, ball, 1] = np.inf
    batch = batch.replace(
        bodies=batch.bodies.replace(lin_vel=jnp.asarray(vel))
    )

    step = jax.jit(jax.vmap(lambda w: physics_step(w, CFG)))
    ref_step = jax.jit(lambda w: physics_step(w, CFG))

    clean = world
    for _ in range(30):
        batch = step(batch)
        clean = ref_step(clean)

    div = np.asarray(batch.diverged)
    assert list(div) == [False, False, True, False]
    pos = np.asarray(batch.bodies.pos)
    assert np.isfinite(pos).all(), "quarantine leaked non-finite state"
    # Healthy scenes exactly match an unbatched run.
    ref = np.asarray(clean.bodies.pos)
    for s in (0, 1, 3):
        np.testing.assert_array_equal(pos[s], ref)
    # The poisoned scene froze at its pre-divergence state (finite).
    assert abs(pos[2, ball, 1] - 2.0) < 0.5
