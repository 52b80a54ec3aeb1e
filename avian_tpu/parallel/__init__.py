"""Multi-device scale-out over a TPU mesh."""

from avian_tpu.parallel.sharding import (
    make_scene_mesh,
    replicate_world,
    shard_world,
    make_batched_step,
    make_batched_step_2d,
    make_sharded_step,
    make_sharded_step_2d,
)

__all__ = [
    "make_scene_mesh",
    "replicate_world",
    "shard_world",
    "make_batched_step",
    "make_batched_step_2d",
    "make_sharded_step",
    "make_sharded_step_2d",
]
