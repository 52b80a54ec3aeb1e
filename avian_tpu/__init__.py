"""avian_tpu — a TPU-native rigid-body physics engine in JAX.

A brand-new engine with the capabilities of the Avian physics engine
(https://github.com/avianphysics/avian), re-designed TPU-first:

- The world is a pytree of fixed-capacity SoA arrays (bodies, colliders,
  contacts, joints) instead of an ECS.
- One physics step is a single pure, jittable function ``step(world, config)``,
  staged like Avian's ``PhysicsStepSystems`` (reference
  ``src/schedule/mod.rs:163-219``): broadphase -> narrowphase -> prepare ->
  substep loop (``lax.scan``) -> restitution -> writeback -> sleeping.
- Thousands of independent scenes batch with ``jax.vmap`` and shard across a
  TPU slice with ``jax.shard_map`` (the TPU-native analogue of Avian's
  intra-step multithreading, reference ``src/utils.rs:26-87``).

Numerical method: semi-implicit Euler integration + substepped "TGS Soft"
impulse solver with warm starting and a bias/relax two-pass scheme, plus XPBD
for joints — matching the reference (``src/dynamics/solver/plugin.rs:27-36``).
"""

from avian_tpu.core.config import PhysicsConfig, SolverConfig, NarrowPhaseConfig
from avian_tpu.core.types import (
    BodyType,
    ShapeType,
    CoefficientCombine,
    JointType,
)
from avian_tpu.core.state import Bodies, Colliders, Contacts, Joints, World
from avian_tpu.core.builder import SceneBuilder
from avian_tpu.core import constructor
from avian_tpu.api.custom_shapes import CustomShape, CUSTOM_SHAPE_BASE
from avian_tpu.pipeline.step import physics_step, rollout
from avian_tpu import queries, api, parallel, character, scenes
from avian_tpu.geometry import contact_query
from avian_tpu.utils import checkpoint, diagnostics

__version__ = "0.1.0"

__all__ = [
    "PhysicsConfig",
    "SolverConfig",
    "NarrowPhaseConfig",
    "BodyType",
    "ShapeType",
    "CoefficientCombine",
    "JointType",
    "Bodies",
    "Colliders",
    "Contacts",
    "Joints",
    "World",
    "SceneBuilder",
    "constructor",
    "CustomShape",
    "CUSTOM_SHAPE_BASE",
    "contact_query",
    "physics_step",
    "rollout",
    "queries",
    "api",
    "parallel",
    "character",
    "scenes",
    "checkpoint",
    "diagnostics",
]
