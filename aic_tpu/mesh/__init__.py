"""Layer 2b: meshing (reference: all-is-cubes-mesh)."""

from .dynamic import CHUNK_SIZE, ChunkedSpaceMesh, CsmUpdateInfo
from .mesher import SpaceMesh, mesh_space, visible_faces

__all__ = [
    "CHUNK_SIZE",
    "ChunkedSpaceMesh",
    "CsmUpdateInfo",
    "SpaceMesh",
    "mesh_space",
    "visible_faces",
]
