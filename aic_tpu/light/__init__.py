"""Layer 1c: global illumination (reference: all-is-cubes/src/space/light)."""

from .chart import build_chart, generate_directions
from .update import evaluate_light, light_update_round, relight_batch

__all__ = [
    "build_chart",
    "generate_directions",
    "evaluate_light",
    "light_update_round",
    "relight_batch",
]
