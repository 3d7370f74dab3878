"""Layer 4: procedural content templates (reference: all-is-cubes-content)."""

from .cornell import cornell_box
from .fractal import menger_sponge
from .testing import light_bench_space

__all__ = ["cornell_box", "light_bench_space", "menger_sponge"]
