"""User-facing runtime APIs: forces, collision queries, events, control."""

from avian_tpu.api import forces, collisions, control

__all__ = ["forces", "collisions", "control"]
