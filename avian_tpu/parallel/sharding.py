"""Scene-batch data parallelism over a TPU mesh.

The reference's parallelism is intra-step multithreading over a shared-memory
task pool (``src/utils.rs:26-87``). The TPU-native translation (SURVEY.md
§2c): within one scene, parallelism comes from vectorization (the whole SoA
step is data-parallel over bodies/pairs); across scenes, thousands of
independent worlds batch along a leading axis with ``vmap`` and shard across
chips along a 1D ``scenes`` mesh axis. Scenes are independent, so the sharded
step induces **zero collectives** — ICI is only touched by user-level metric
reductions or checkpoint gathers.

Spatial domain sharding of one giant scene (halo exchange of boundary bodies
with ``ppermute``) is the CP/SP analogue and intentionally out of scope here.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avian_tpu.core.config import PhysicsConfig
from avian_tpu.core.state import World
from avian_tpu.pipeline.step import physics_step

SCENE_AXIS = "scenes"


def make_scene_mesh(devices=None) -> Mesh:
    """1D mesh over all (or given) devices along the scene-batch axis."""
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (SCENE_AXIS,))


def replicate_world(world: World, batch: int) -> World:
    """Tile a single scene into a leading batch axis (host-side cheap)."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), world
    )


def shard_world(world: World, mesh: Mesh) -> World:
    """Place a batched world so the leading scene axis is split over the
    mesh. All other axes are replicated (each scene lives on one chip)."""
    sharding = NamedSharding(mesh, P(SCENE_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), world)


def make_batched_step(config: PhysicsConfig):
    """vmapped single-chip step: ``World[batch] -> World[batch]``."""

    @jax.jit
    def step(world):
        return jax.vmap(lambda w: physics_step(w, config))(world)

    return step


def make_sharded_step(config: PhysicsConfig, mesh: Mesh):
    """Multi-chip step via ``shard_map``: the scene batch is split over the
    mesh; each shard runs the vmapped step locally with no communication."""

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(SCENE_AXIS),),
        out_specs=P(SCENE_AXIS),
        # The step mixes traced values with manifold constants inside
        # lax.switch branches; the varying-manual-axes check can't prove
        # they match. Scenes are independent, so replication checking is
        # unnecessary here.
        check_vma=False,
    )
    def step(world):
        return jax.vmap(lambda w: physics_step(w, config))(world)

    return step


def make_batched_step_2d(config: PhysicsConfig):
    """vmapped single-chip 2D step: ``World2D[batch] -> World2D[batch]``.
    (``replicate_world``/``shard_world`` are generic pytree maps and work
    on ``World2D`` unchanged.)"""
    from avian_tpu.dim2.step import physics_step_2d

    @jax.jit
    def step(world):
        return jax.vmap(lambda w: physics_step_2d(w, config))(world)

    return step


def make_sharded_step_2d(config: PhysicsConfig, mesh: Mesh):
    """Multi-chip 2D step via ``shard_map`` (zero collectives, like the 3D
    variant)."""
    from avian_tpu.dim2.step import physics_step_2d

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(SCENE_AXIS),),
        out_specs=P(SCENE_AXIS),
        check_vma=False,
    )
    def step(world):
        return jax.vmap(lambda w: physics_step_2d(w, config))(world)

    return step


def gather_metrics(per_scene_metrics):
    """Mean-reduce per-scene diagnostics across the batch (works under both
    the batched and sharded step; psum/mean over the leading axis)."""
    return jax.tree.map(lambda x: jnp.mean(x, axis=0), per_scene_metrics)
