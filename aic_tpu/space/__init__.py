"""Layer 1b: Space — the world voxel array (reference: all-is-cubes/src/space.rs)."""

from .sky import DAY_SKY_COLOR, Sky
from .space import Space, SpacePhysics
from .state import BlockTables, SpaceState, lookup_contents, lookup_light, scatter_set_cubes

__all__ = [
    "DAY_SKY_COLOR",
    "Sky",
    "Space",
    "SpacePhysics",
    "BlockTables",
    "SpaceState",
    "lookup_contents",
    "lookup_light",
    "scatter_set_cubes",
]
