"""Layer 4: procedural content templates (reference: all-is-cubes-content)."""

from .atrium import atrium
from .city import demo_city
from .cornell import cornell_box
from .fractal import menger_sponge
from .landscape import demo_blocks, voxel_block
from .template import (
    TEMPLATE_NAMES,
    TemplateParameters,
    build_template_space,
    build_universe,
)
from .testing import light_bench_space

__all__ = [
    "TEMPLATE_NAMES",
    "TemplateParameters",
    "atrium",
    "build_template_space",
    "build_universe",
    "cornell_box",
    "demo_blocks",
    "demo_city",
    "light_bench_space",
    "menger_sponge",
    "voxel_block",
]
