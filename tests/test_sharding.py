"""Multi-device scene-batch sharding on the virtual 8-device CPU mesh.

The conftest forces ``xla_force_host_platform_device_count=8``; these tests
exercise the same ``shard_map`` path the driver validates via
``__graft_entry__.dryrun_multichip`` (SURVEY.md §2c item 6 — the TPU-native
translation of the reference's multithreading, ``src/utils.rs:26-87``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache():
    """Serializing the 8-device sharded executables into the persistent
    compilation cache aborts the process (XLA CHECK) when it happens late
    in a long test session; sharded programs skip the cache."""
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    from avian_tpu.utils.cache import enable

    enable()

from avian_tpu import PhysicsConfig
from avian_tpu.parallel import (
    make_batched_step,
    make_scene_mesh,
    make_sharded_step,
    replicate_world,
    shard_world,
)
from avian_tpu.scenes import cube_pile

CONFIG = PhysicsConfig(substeps=2, max_colors=4, sap_window=4)


def _batched_world(batch):
    world, _ = cube_pile(n_cubes=8, max_contacts=64)
    batched = replicate_world(world, batch)
    heights = 1.0 + 0.1 * np.arange(batch, dtype=np.float32)
    pos = np.array(batched.bodies.pos)
    pos[:, 1, 1] += heights
    return batched.replace(bodies=batched.bodies.replace(pos=jnp.asarray(pos)))


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8, "conftest must force 8 host devices"


def test_sharded_step_runs_and_stays_finite():
    mesh = make_scene_mesh(jax.devices()[:8])
    batched = shard_world(_batched_world(16), mesh)
    step = make_sharded_step(CONFIG, mesh)
    out = step(batched)
    jax.block_until_ready(out.bodies.pos)
    assert bool(jnp.all(jnp.isfinite(out.bodies.pos)))
    # The output keeps the scene axis sharded over the mesh.
    shardings = {
        str(d) for d in out.bodies.pos.sharding.device_set
    }
    assert len(shardings) == 8


def test_sharded_matches_unsharded():
    """shard_map over 8 chips computes exactly what the vmapped single-chip
    step computes (scenes are independent; zero collectives)."""
    mesh = make_scene_mesh(jax.devices()[:8])
    batched = _batched_world(8)

    ref = make_batched_step(CONFIG)(batched)
    out = make_sharded_step(CONFIG, mesh)(shard_world(batched, mesh))

    np.testing.assert_allclose(
        np.asarray(out.bodies.pos), np.asarray(ref.bodies.pos), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.bodies.lin_vel),
        np.asarray(ref.bodies.lin_vel),
        atol=1e-6,
    )


def test_dryrun_multichip_entry():
    """The driver's actual entry point must work end-to-end."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_2d_matches_unsharded():
    """The dedicated 2D profile shards over the scene mesh identically."""
    from avian_tpu.dim2 import scenes as scenes2d
    from avian_tpu.parallel import make_batched_step_2d, make_sharded_step_2d

    config = PhysicsConfig(substeps=2, max_colors=4)
    world, _ = scenes2d.box_pyramid_2d(base=3)
    batch = 8
    batched = replicate_world(world, batch)
    offsets = 0.05 * np.arange(batch, dtype=np.float32)
    pos = np.array(batched.bodies.pos)
    pos[:, 1, 1] += offsets
    batched = batched.replace(
        bodies=batched.bodies.replace(pos=jnp.asarray(pos))
    )

    mesh = make_scene_mesh(jax.devices()[:8])
    plain = make_batched_step_2d(config)
    sharded = make_sharded_step_2d(config, mesh)

    w_plain = batched
    w_shard = shard_world(batched, mesh)
    for _ in range(5):
        w_plain = plain(w_plain)
        w_shard = sharded(w_shard)
    np.testing.assert_allclose(
        np.asarray(w_plain.bodies.pos), np.asarray(w_shard.bodies.pos),
        atol=1e-6,
    )
    assert bool(jnp.all(jnp.isfinite(w_shard.bodies.pos)))
