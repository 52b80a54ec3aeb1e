"""Math layer: vectors, quaternions, 2D rotations, symmetric 3x3 tensors.

TPU-native counterpart of the reference's ``src/math/`` (glam/bevy_math based,
reference ``src/math/mod.rs:21-26``). Everything operates on trailing-axis
arrays so it composes with ``jax.vmap`` and XLA fusion.
"""

from avian_tpu.math import quat, sym3, vec, rot2

__all__ = ["quat", "sym3", "vec", "rot2"]
