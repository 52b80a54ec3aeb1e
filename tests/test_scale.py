"""Scale regression: a settling pile must stay finite with zero dropped
constraints — the failure mode that sank round 1's flagship bench (coloring
overflow -> un-relaxed Jacobi divergence as the pile settles).

Mirrors the reference's stress scenes (``benches/src/dim3/``), driven with a
single ``lax.scan`` rollout so the whole test compiles once.
"""

import jax
import jax.numpy as jnp
import numpy as np

from avian_tpu import PhysicsConfig, physics_step
from avian_tpu.core.types import ShapeType
from avian_tpu.pipeline import broadphase as bp_m
from avian_tpu.pipeline import contacts as np_m
from avian_tpu.pipeline import solver as sol_m
from avian_tpu.pipeline import solver_body as sb_m
from avian_tpu.pipeline.step import physics_step
from avian_tpu.scenes import cube_pile

# Bench protocol config (60 Hz, 4 substeps) but at a CI-sized scale.
CONFIG = PhysicsConfig(
    substeps=4,
    shape_pairs=(
        (ShapeType.BOX, ShapeType.BOX),
        (ShapeType.BOX, ShapeType.PLANE),
    ),
)
N = 512


def test_pile_settles_finite_no_overflow_drops():
    world, _ = cube_pile(n_cubes=N, max_contacts=8 * N)

    def body(w, _):
        return physics_step(w, CONFIG), None

    # 150 steps is past the point where round 1's 10k run diverged (~75-80)
    # relative to pile height; this pile is 8 layers like the flagship.
    world, _ = jax.lax.scan(body, world, None, length=150)

    pos = np.asarray(world.bodies.pos)
    assert np.isfinite(pos).all(), "pile diverged to NaN"
    vel = np.asarray(world.bodies.lin_vel)
    assert np.isfinite(vel).all()
    # The pile must have settled into a bounded heap, not exploded.
    assert float(np.abs(pos).max()) < 100.0

    @jax.jit
    def check(w):
        w = bp_m.update_aabbs(w, CONFIG)
        bp = bp_m.broad_phase(w, CONFIG)
        contacts = np_m.narrow_phase(w, bp, CONFIG)
        con = sol_m.prepare_constraints(
            w, contacts, sb_m.prepare(w.bodies), CONFIG
        )
        max_pen = jnp.max(
            jnp.where(
                contacts.touching[:, None],
                contacts.penetration,
                0.0,
            )
        )
        return bp.dropped, con.overflow_dropped, con.num_overflow, max_pen

    dropped, overflow_dropped, num_overflow, max_pen = check(world)
    assert int(dropped) == 0, "broadphase dropped pairs at scale"
    assert int(overflow_dropped) == 0, "constraints dropped from buckets"
    # Settled pile: resting penetration stays within a few cm.
    assert float(max_pen) < 0.1, f"excessive penetration {float(max_pen)}"


def test_small_pile_complete_pairs():
    """Regression: in a small scene every collider is a large fraction of
    the scene extent; the 'big collider' dense-pass routing must use the
    MEDIAN-relative criterion or the whole scene overflows the dense pass
    and silently loses pairs (27-cube pile lost half its contacts)."""
    from avian_tpu.scenes import cube_pile

    world, _ = cube_pile(n_cubes=27)
    cfg = PhysicsConfig()

    def body(w, _):
        return physics_step(w, cfg), None

    import jax

    world, _ = jax.lax.scan(body, world, None, length=60)
    w2 = bp_m.update_aabbs(world, cfg)
    bp = bp_m.broad_phase(w2, cfg)
    contacts = np_m.narrow_phase(w2, bp, cfg)
    assert int(bp.dropped) == 0
    # A settled 3x3x3 stack: 9 ground contacts + 18 vertical pairs plus
    # lateral neighbor pairs.
    assert int(jnp.sum(contacts.touching)) >= 27
    pos = np.asarray(world.bodies.pos)
    assert np.isfinite(pos).all()


def test_deep_stack_no_ground_tunneling():
    """Static-contact color priority (``constraint_graph.rs:44-48``): a
    12-box tower at the bench's 4 substeps must not tunnel into the
    ground — ground contacts solve in the LAST colors, correcting the
    stack's internal impulses (VERDICT round-2 item 9)."""
    from avian_tpu import BodyType, SceneBuilder
    from avian_tpu.pipeline.step import rollout

    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0), friction=0.6)
    half = 0.5
    boxes = []
    for i in range(12):
        body = b.add_body(pos=(0.0, half + i * 2 * half * 1.001, 0.0))
        b.box(body, half, half, half, friction=0.6)
        boxes.append(body)
    world = b.finalize(max_bodies=16, max_colliders=16, max_contacts=256)
    world = rollout(world, CONFIG, 240)

    pos = np.asarray(world.bodies.pos)
    assert np.isfinite(pos).all()
    # Bottom box rests ON the ground: its center never sinks below
    # half-extent minus a small resting tolerance.
    assert pos[boxes[0], 1] > half - 0.05, f"tunneled: y={pos[boxes[0], 1]}"
    # The tower is still a tower (no collapse through each other).
    tops = pos[boxes, 1]
    assert (np.diff(tops) > 0.5).all(), f"stack collapsed: {tops}"
