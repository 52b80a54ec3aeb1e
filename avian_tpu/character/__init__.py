"""Character controller utilities (``src/character_controller/``)."""

from avian_tpu.character.move_and_slide import (
    MoveAndSlideConfig,
    move_and_slide,
    depenetrate,
    project_velocity,
)

__all__ = [
    "MoveAndSlideConfig",
    "move_and_slide",
    "depenetrate",
    "project_velocity",
]
