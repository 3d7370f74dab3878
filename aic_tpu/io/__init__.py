"""Layer 5: save/load + import/export (reference: all-is-cubes/src/save, all-is-cubes-port)."""

from .export import export_gltf, export_gltf_animation, export_stl
from .import_ref import load_alliscubesjson, save_alliscubesjson
from .save import load_universe, save_universe
from .vox import export_vox, import_vox

__all__ = ["export_gltf", "export_gltf_animation", "export_stl",
    "load_alliscubesjson", "save_alliscubesjson", "load_universe", "save_universe",
           "export_vox", "import_vox"]
