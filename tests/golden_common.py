"""Shared scenes + configs for the golden-trajectory determinism tests.

The reference's bar (``src/tests/determinism_2d.rs:8-12``): after 500 steps
at 1/64 s, the hash of all (Position, Rotation) must equal a committed
golden hash on every platform. Here the golden artifacts (committed npz
under ``tests/golden/``) are recorded on XLA:CPU; the test asserts

- CPU runs reproduce the recorded trajectory bit-exactly (hash match),
- any backend (e.g. real TPU via ``AVIAN_GOLDEN_BACKEND``) stays within
  1e-3 positional drift of the recording — the substitute for the
  impossible cargo-based Avian parity run (VERDICT round-2 item 2), and a
  permanent trap for formula drift: a changed softness constant or sign
  fails these even though every invariant test still passes.

Regenerate after INTENTIONAL dynamics changes with:
    env PYTHONPATH= JAX_PLATFORMS=cpu python tests/golden_common.py record
and say why in the commit message.
"""

import hashlib
import os

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
STRIDE = 10  # record every 10th step
NUM_STEPS = 500
DT = 1.0 / 64.0


def _config():
    from avian_tpu import PhysicsConfig

    return PhysicsConfig(dt=DT, max_colors=8)


def scenes():
    """name -> (world, config) for each golden scene."""
    from avian_tpu import BodyType, SceneBuilder
    from avian_tpu.scenes import falling_hinges

    out = {}
    w, _ = falling_hinges(rows=10, cols=4)  # 40 hinged boxes (CI-sized)
    out["falling_hinges"] = (w, _config())

    b = SceneBuilder()
    g = b.add_body(body_type=BodyType.STATIC)
    b.half_space(g, normal=(0, 1, 0), friction=0.6)
    for i in range(3):
        body = b.add_body(pos=(0.1 * i, 0.55 + 1.02 * i, -0.05 * i))
        b.box(body, 0.5, 0.5, 0.5, friction=0.6)
    out["stack3"] = (
        b.finalize(max_bodies=4, max_colliders=4, max_contacts=32),
        _config(),
    )
    return out


def run_trajectory(world, config):
    """(frames_pos f32[F, N, 3], frames_quat f32[F, N, 4], final hash)."""
    import jax
    import jax.numpy as jnp

    from avian_tpu.pipeline.step import physics_step

    def body(w, _):
        w = physics_step(w, config)
        return w, (w.bodies.pos, w.bodies.quat)

    world, (pos, quat) = jax.lax.scan(
        body, world, None, length=NUM_STEPS
    )
    pos = np.asarray(pos[STRIDE - 1::STRIDE])
    quat = np.asarray(quat[STRIDE - 1::STRIDE])
    digest = hashlib.sha256(
        np.ascontiguousarray(pos).tobytes()
        + np.ascontiguousarray(quat).tobytes()
    ).hexdigest()
    return pos, quat, digest


def scenes_2d():
    """name -> (world2d, config) golden scenes on the native 2D engine."""
    from avian_tpu.dim2 import scenes as scenes2d

    w, _ = scenes2d.box_pyramid_2d(base=6)  # 21 boxes
    return {"pyramid2d_native": (w, _config())}


def run_trajectory_2d(world, config):
    """(frames_pos f32[F, N, 2], frames_angle f32[F, N], final hash) on
    the dedicated 2D profile."""
    import jax

    from avian_tpu.dim2.step import physics_step_2d

    def body(w, _):
        w = physics_step_2d(w, config)
        return w, (w.bodies.pos, w.bodies.angle)

    world, (pos, angle) = jax.lax.scan(body, world, None, length=NUM_STEPS)
    pos = np.asarray(pos[STRIDE - 1::STRIDE])
    angle = np.asarray(angle[STRIDE - 1::STRIDE])
    digest = hashlib.sha256(
        np.ascontiguousarray(pos).tobytes()
        + np.ascontiguousarray(angle).tobytes()
    ).hexdigest()
    return pos, angle, digest


def record():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, (world, config) in scenes().items():
        pos, quat, digest = run_trajectory(world, config)
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(
            path, pos=pos, quat=quat, sha256=np.frombuffer(
                bytes.fromhex(digest), np.uint8
            )
        )
        print(f"recorded {name}: {pos.shape} frames, sha256={digest}")
    for name, (world, config) in scenes_2d().items():
        pos, angle, digest = run_trajectory_2d(world, config)
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(
            path, pos=pos, angle=angle, sha256=np.frombuffer(
                bytes.fromhex(digest), np.uint8
            )
        )
        print(f"recorded {name}: {pos.shape} frames, sha256={digest}")


if __name__ == "__main__":
    import sys

    if "record" in sys.argv:
        record()
    else:
        print(__doc__)
